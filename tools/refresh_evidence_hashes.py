"""Snapshot certified source hashes into ``EVIDENCE_HASHES.json``.

Run at ROUND START, before editing any operator, while the working tree
still equals the tree the driver's sweep certified. For every key whose
latest driver verdict in ``CORRECTNESS_r*.json`` is "pass":

- not yet recorded                      -> record (current hash, round)
- recorded at an older round than the
  latest pass                           -> re-record (driver has since
                                           re-certified the current code)
- recorded at the same-or-newer round   -> keep the recorded hash (never
                                           launder an uncertified edit)

Keys whose latest verdict is "err" are dropped from the snapshot — they
must re-enter the sweep window regardless of hash.

Usage: python tools/refresh_evidence_hashes.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from nfdump2clickhouse_spark import registry  # noqa: E402


def refresh() -> dict[str, dict]:
    detail = registry._evidence_detail()
    recorded = registry._certified_hashes()
    specs = registry._REGISTRY
    registry._load_operators()
    specs = registry._REGISTRY

    out: dict[str, dict] = {}
    added, updated, dropped = 0, 0, 0
    for key, (verdict, rnd) in sorted(detail.items()):
        if verdict != "pass":
            if key in recorded:
                dropped += 1
            continue
        spec = specs.get(key)
        if spec is None:
            continue
        rec = recorded.get(key)
        if isinstance(rec, dict) and rec.get("round", -1) >= rnd:
            out[key] = rec  # keep: no newer certification than the record
            continue
        out[key] = {"hash": registry.source_hash(spec.fn), "round": rnd}
        if rec is None:
            added += 1
        else:
            updated += 1

    path = ROOT / "EVIDENCE_HASHES.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(
        f"EVIDENCE_HASHES.json: {len(out)} certified keys "
        f"(+{added} added, {updated} re-recorded, -{dropped} dropped)"
    )
    return out


if __name__ == "__main__":
    refresh()
