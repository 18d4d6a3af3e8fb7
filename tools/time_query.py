"""Time individual queries in isolation (fresh tuned session, noop sink).

Usage:
    python tools/time_query.py <query> [query ...]      # 1 warm-up + 4 timed

Prints every sample plus the min — bench.py's steady-state figure. Use for
before/after evidence on a single operator without paying a full bench run;
the committed BENCH artifacts remain the round-level evidence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from futures_eos_cdc_spark.plans import QUERIES  # noqa: E402
from futures_eos_cdc_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("TIME_QUERY_RUNS", "4"))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(
        "time-query",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        samples = []
        for i in range(RUNS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"timed{i}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: warm={warm:.2f} samples="
            + ",".join(f"{s:.2f}" for s in samples)
            + f" min={min(samples):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
