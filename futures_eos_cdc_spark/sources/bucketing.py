"""Bucketed-table layout: the 100 TB co-located-join strategy.

At scale, the dominant cost of fact-fact joins (lineitem ⋈ orders) is the
shuffle of both sides. Bucketing pre-partitions the data on the join key at
WRITE time (`bucketBy` + `sortBy` + `saveAsTable`): readers see
`HashPartitioning(key, n)` on both sides, so Catalyst plans a sort-merge join
with ZERO Exchange — and with `sortBy`, zero Sort. The shuffle is paid once
at ingest, amortized over every subsequent join/aggregation on that key.

Rules of thumb this module encodes:
- bucket count is a power of two sized so one bucket ≈ 100-200 MB at target
  scale (local tests use small counts; the layout logic is identical);
- bucket BOTH sides of a recurring join with the SAME count and key, or one
  side's buckets must be a multiple of the other's
  (`spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
- `sortBy` the bucket key so merge-join needs no sort, and groupBy on the
  bucket key needs no exchange either.

Reference parity note: the reference co-locates by Kafka partition key
(symbol — SignalTopology.kt:110); bucketing is the batch-storage equivalent
of that design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist `df` bucketed (and bucket-sorted) on `bucket_cols`.

    Uses saveAsTable (bucket metadata lives in the catalog); `path` pins the
    files outside the default warehouse so tests control the location.
    """
    # One file per bucket: Spark's scan only reports bucket-sorted output
    # ordering (→ sort-free merge join) when each bucket is a single file.
    out = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    writer = out.write.mode("overwrite").option("path", path).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either side (assert via tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Persist `df` hive-partitioned on `partition_cols` — the pruning half
    of the 100 TB layout story (bucketing co-locates joins; directory
    partitioning lets predicates skip whole partitions at planning time).

    Partition columns should be LOW-cardinality (date, hour, category):
    each distinct tuple becomes a directory, and a filter on the column
    becomes a `PartitionFilters` entry in the scan — zero I/O for pruned
    partitions, visible in `.explain` as `PartitionCount: k`.

    `files_per_partition` caps the file count per directory (the
    small-files guard): rows are pre-shuffled on (partition_cols, spread)
    where spread is a deterministic content hash mod the cap, so each
    directory is written by at most that many tasks. At 100 TB pick it so
    files land ~128-512 MB. AQE partition coalescing composes: when the
    actual data is small it merges the spread splits back down (fewer,
    fuller files); at scale the splits survive and bound file size.
    """
    from pyspark.sql import functions as F

    spread = F.pmod(
        F.hash(*[df[c] for c in df.columns]), F.lit(files_per_partition)
    ).alias("_spread")
    (
        df.repartition(*([df[c] for c in partition_cols] + [spread]))
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partition_pruned(
    spark: SparkSession, path: str
) -> DataFrame:
    """Read a hive-partitioned layout; partition columns come back as
    regular columns and equality/range predicates on them prune directories
    at planning time (no file listing beyond the matching partitions)."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout: multi-column file skipping
# ---------------------------------------------------------------------------
def zorder_key_sql(a_sql: str, b_sql: str, bits: int = 8, div_op: str = "div") -> str:
    """Morton interleave of two bucket ids (each in [0, 2^bits)) as portable
    integer arithmetic — bit i of `a` lands at position 2i, bit i of `b` at
    2i+1. Pure div/mod/multiply so the SAME formula runs in Spark SQL
    (``div_op='div'``) and DuckDB (``div_op='//'``), making the layout key
    oracle-replayable. Unrolled (bits terms) — constant-folded into one
    codegen expression.

    Why z-order at 100 TB: sorting by ONE column gives perfect file-level
    min/max pruning on that column and none on any other; interleaving
    bits gives useful pruning on BOTH (each file covers a small rectangle
    of the value space instead of a full-width stripe) — the layout behind
    lakehouse OPTIMIZE ZORDER. Write with repartitionByRange(zkey) +
    sortWithinPartitions(zkey) so each file owns a contiguous key range.
    """
    terms = []
    for i in range(bits):
        terms.append(
            f"((({a_sql}) {div_op} {1 << i}) % 2) * {1 << (2 * i)}"
            f" + ((({b_sql}) {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_key_expr(a, b, bits: int = 8):
    """Spark Column form of ``zorder_key_sql``.

    Accepts column NAMES (one parsed expression — the cheap path used by
    the registry) or ``Column`` expressions, matching the rest of the
    public functions surface; a Column's repr must never leak into an
    ``F.expr`` string, so the Column path builds the same arithmetic with
    Column operators."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    if isinstance(a, str) and isinstance(b, str):
        return F.expr(zorder_key_sql(a, b, bits, div_op="div"))
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    assert isinstance(a, Column) and isinstance(b, Column)
    z = F.lit(0)
    for i in range(bits):
        z = z + (
            ((a / (1 << i)).cast("long") % 2) * (1 << (2 * i))
            + ((b / (1 << i)).cast("long") % 2) * (1 << (2 * i + 1))
        )
    return z
