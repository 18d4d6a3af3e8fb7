"""Loaders for the driver's deterministic parquet fixtures (TESTDATA.md).

Parquet is the engine's canonical batch source: columnar scan with predicate
pushdown and column pruning for free (check ``PushedFilters`` / ``ReadSchema``
in ``df.explain("formatted")``). At 100 TB these tables would be
partitioned/bucketed on their join keys; here each is a single file — the
loader is where partition discovery would plug in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by default;
    # read it as a LongType of epoch-nanos (the engine's canonical event-time
    # representation — integer, timezone-proof, full precision).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
