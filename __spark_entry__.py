"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``futures_eos_cdc_spark``; this module only adapts
the registry (futures_eos_cdc_spark/plans/registry.py) to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from futures_eos_cdc_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["signal_decisions"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check).

    Triggers the lazy persisted-model ensure (VERDICT r10 wrong #1): the
    v1k-BPE / unigram oracle SQL reads trained tables from disk; training
    them here — first oracle use — instead of at package import keeps
    `import futures_eos_cdc_spark.plans` side-effect-free while still
    guaranteeing the tables exist before any oracle runs, whatever order
    the harness executes queries and oracles in.
    """
    from futures_eos_cdc_spark.plans.dataprep import ensure_oracle_model_tables

    ensure_oracle_model_tables()
    return dict(ORACLES)
