"""Measure LZO1X ingest throughput (VERDICT r6 missing-#4 / next-#5).

The pure-Python decoder in ``sources/lzo1x.py`` is correct (golden +
fuzz pins) but its speed was never quantified — the "a few MB/s" caveat
and the ``decode_cmd`` native-tool recommendation need numbers. Three
measurements:

1. e2e: write an LZO1X-compressed nfcapd directory of realistic size
   and time ``read_nffile_directory`` end-to-end on local[32] → rows/s
   (files decode in parallel, one file per task — the deployment shape).
2. codec micro, literal path: ``lzo1x.decompress`` single-thread MB/s on
   the writer's own literal-only blocks (what our fixtures contain).
3. codec micro, match path: MB/s on a synthetic long-match stream
   (the [32, 4, 0, 0] M3 vector from tests/test_lzo1x.py repeated) —
   real nfcapd blocks from nfdump's compressor sit between 2 and 3.

Run on a QUIET box: ``python tools/lzo_throughput.py [records_per_file]``.
Prints one JSON line; paste into BENCH_NOTES_r<N>.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from nfdump2clickhouse_spark.sources import lzo1x
from nfdump2clickhouse_spark.sources.nffile import COMPRESSION_LZO, write_nffile

N_FILES = 8
RECORDS_PER_FILE = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000


def _mb_per_s(payload: bytes, out_len: int, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = lzo1x.decompress(payload, out_len)
        best = min(best, time.perf_counter() - t0)
    assert len(out) <= out_len
    return round(len(out) / best / 1e6, 2)


def main() -> None:
    base = tempfile.mkdtemp(prefix="sf_lzo_bench_")
    try:
        t0 = time.perf_counter()
        write_nffile(
            base,
            n_files=N_FILES,
            records_per_file=RECORDS_PER_FILE,
            compression=COMPRESSION_LZO,
        )
        gen_s = round(time.perf_counter() - t0, 1)
        total_bytes = sum(
            os.path.getsize(os.path.join(base, f)) for f in os.listdir(base)
        )

        # micro 2: literal path — one writer-sized block of record-ish bytes
        raw = os.urandom(1 << 20)
        lit = lzo1x.compress(raw)
        lit_mbs = _mb_per_s(lit, len(raw))

        # micro 3: match path — initial literal + repeated 37-byte M3
        # copies from dist 1 (the golden long-match vector), ~1 MiB out
        n_m3 = (1 << 20) // 37
        match_stream = (
            bytes([18]) + b"a" + bytes([32, 4, 0, 0]) * n_m3 + bytes([17, 0, 0])
        )
        match_out = 1 + 37 * n_m3
        match_mbs = _mb_per_s(match_stream, match_out)

        # micro 4: SHORT-match worst case — 3-byte M2 copies (t=64, h=0:
        # len 3, dist 1, no trailing literals); per-instruction overhead
        # dominates, the floor for pathologically chopped streams
        n_m2 = (1 << 19) // 3
        short_stream = (
            bytes([18]) + b"a" + bytes([64, 0]) * n_m2 + bytes([17, 0, 0])
        )
        short_out = 1 + 3 * n_m2
        short_mbs = _mb_per_s(short_stream, short_out)

        # e2e: the deployment shape — parallel decode over files
        from nfdump2clickhouse_spark.session import get_spark
        from nfdump2clickhouse_spark.sources.flows import read_nffile_directory

        spark = get_spark("lzo-throughput")
        df = read_nffile_directory(spark, base, flowsrc="lzo-bench")
        df.count()  # warm: session + Arrow worker pool
        t0 = time.perf_counter()
        n = df.count()
        e2e_s = time.perf_counter() - t0
        spark.stop()

        print(
            json.dumps(
                {
                    "metric": "lzo1x_ingest",
                    "n_files": N_FILES,
                    "records_per_file": RECORDS_PER_FILE,
                    "capture_bytes_total": total_bytes,
                    "fixture_gen_sec": gen_s,
                    "rows_decoded": n,
                    "e2e_rows_per_sec": round(n / e2e_s, 1),
                    "e2e_sec": round(e2e_s, 2),
                    "decompress_literal_mb_per_sec": lit_mbs,
                    "decompress_match_mb_per_sec": match_mbs,
                    "decompress_short_match_mb_per_sec": short_mbs,
                    "load_1min": round(os.getloadavg()[0], 2),
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
