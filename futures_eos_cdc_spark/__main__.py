"""Command-line entry point: run any registered query from a shell.

A reference user runs fixed topologies (`apps/`); the Spark engine's
equivalent front door is "run a named query against a fixture dir":

    python -m futures_eos_cdc_spark list
    python -m futures_eos_cdc_spark run signal_decisions
    python -m futures_eos_cdc_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.1 --limit 50
    python -m futures_eos_cdc_spark explain ngram_jaccard_near_dup

`run` prints the result as Spark's table rendering; `explain` prints the
formatted physical plan (the artifact the scale design notes talk about).
Driver-contract consumers should keep importing ``__spark_entry__``; this
module is the human-facing wrapper over the same registry.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="futures_eos_cdc_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered query names")
    for cmd in ("run", "explain"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        sp.add_argument(
            "--sf-dir",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        )
        if cmd == "run":
            sp.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    from .plans import QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            print(name)
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query!r} (see `list`)", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(
        "futures_eos_cdc_spark-cli",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
