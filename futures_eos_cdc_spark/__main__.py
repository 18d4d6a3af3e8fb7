"""Command-line entry point: run any registered query from a shell.

A reference user runs fixed topologies (`apps/`); the Spark engine's
equivalent front door is "run a named query against a fixture dir":

    python -m futures_eos_cdc_spark list
    python -m futures_eos_cdc_spark run signal_decisions
    python -m futures_eos_cdc_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.1 --limit 50
    python -m futures_eos_cdc_spark explain ngram_jaccard_near_dup
    python -m futures_eos_cdc_spark gate-index info /data/idx
    python -m futures_eos_cdc_spark gate-index compact /data/idx
    python -m futures_eos_cdc_spark gate-index gc /data/idx --grace-s 300

`run` prints the result as Spark's table rendering; `explain` prints the
formatted physical plan (the artifact the scale design notes talk about).
`gate-index` is the maintenance front door for the dedup admission-gate
index (operators.gate_index): ``info`` prints kind/options/committed
batches, ``compact`` consolidates every committed batch, ``gc`` reaps
orphans — the cadence the module docstring recommends, runnable from
cron. Driver-contract consumers should keep importing
``__spark_entry__``; this module is the human-facing wrapper over the
same registry.
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
    gi = sub.add_parser(
        "gate-index", help="admission-gate index maintenance (info/compact/gc)"
    )
    gi.add_argument("action", choices=("info", "compact", "gc"))
    gi.add_argument("path")
    gi.add_argument(
        "--grace-s", type=float, default=None,
        help="gc reader-protection grace (default: the store GC grace)",
    )
    gi.add_argument("--target-partitions", type=int, default=8)
    args = p.parse_args(argv)

    if args.cmd == "gate-index":
        return _gate_index_cmd(args)

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


def _gate_index_cmd(args) -> int:
    """Maintenance actions over one on-disk admission-gate index. Only
    ``compact`` needs a SparkSession (it rewrites parquet); ``info`` and
    ``gc`` are manifest/filesystem work and stay JVM-free so a cron
    entry for them costs milliseconds."""
    import json

    from .operators.gate_index import DedupGateIndex

    try:
        idx = DedupGateIndex.open(args.path)
    except FileNotFoundError:
        print(f"no gate index at {args.path!r} (_GATE_KIND.json missing)",
              file=sys.stderr)
        return 2

    if args.action == "info":
        bids = idx._committed()
        print(json.dumps({
            "path": idx.path,
            "kind": idx.kind,
            "id_col": idx.id_col,
            "text_col": idx.text_col,
            "opts": idx.opts,
            "tables": list(idx._table_names()),
            "committed_batches": len(bids),
            "idempotency_tokens": len(idx._token_bids()),
        }, indent=1))
        return 0
    if args.action == "gc":
        deleted = idx.gc(grace_s=args.grace_s)
        print(json.dumps({"deleted": deleted}))
        return 0
    from .session import get_spark

    spark = get_spark(
        "futures_eos_cdc_spark-gate-maint",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    bid = idx.compact(spark, target_partitions=args.target_partitions)
    print(json.dumps({"consolidated_bid": bid}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
