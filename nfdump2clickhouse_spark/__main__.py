"""Operational CLI — the entry point the generated systemd units invoke
(`python -m nfdump2clickhouse_spark run-once --conf <ini>`), mirroring the
reference daemon's per-rotation loop: drain everything new, apply
retention, exit (service.generate_systemd_units pairs it with a timer).
"""

from __future__ import annotations

import argparse

from .service import FlowService, parse_config
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nfdump2clickhouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, hlp in (
        ("run-once", "drain all sources once, then apply retention (timer mode)"),
        ("retention", "drop expired dt= partitions only"),
        ("compact", "rewrite many-small-file partitions into few sorted files"),
    ):
        sp = sub.add_parser(name, help=hlp)
        sp.add_argument("--conf", required=True, help="ini config path")
    args = p.parse_args(argv)
    svc = FlowService(get_spark("nfdump2clickhouse"), parse_config(args.conf))
    if args.cmd == "run-once":
        svc.run_once()
        dropped = svc.run_retention()
    elif args.cmd == "retention":
        dropped = svc.run_retention()
        print("\n".join(dropped))
    else:
        print("\n".join(svc.run_compaction()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
