"""Capture .explain("formatted") for registered queries into plans/<round>/.

Usage:
    python tools/capture_plans.py <suffix> [query ...]

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (round defaults
to r14) for each named query (all queries when none are named). The suffix
is "before" for the round's baseline capture and "after" for each
post-change capture — the judge checks plan claims in OPTIMIZATION_<round>.md
against these files.

Plans are captured lazily (no execution): this shows the AQE initial plan
(isFinalPlan=false), which is where Exchange placement, join strategy,
PushedFilters/ReadSchema and Batch/ArrowEvalPython nodes are all visible.
Iterative operators (connected_components, pagerank, IVF training) DO run
jobs during construction; their captured plan is the final-stage plan over
materialized intermediates, noted in OPTIMIZATION_r13.md where relevant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from futures_eos_cdc_spark.plans import QUERIES  # noqa: E402
from futures_eos_cdc_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or sorted(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(
        "capture-plans",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: {len(txt)} chars -> {path}", flush=True)


if __name__ == "__main__":
    main()
