"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow-but-CPU-heavy input to use the whole cluster.

    A small parquet file arrives as ONE split, which serializes per-row
    compute (hashing, tokenization, decode) on a single core no matter how
    many executors exist. For such operators the one-off round-robin shuffle
    is far cheaper than the lost parallelism. No-op when the input already
    has enough partitions (the 100 TB case — files give ample splits).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
