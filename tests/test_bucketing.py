"""Bucketed-layout tests: the co-located-join strategy must actually remove
the exchanges (and sorts) from the physical plan, not just intend to."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from futures_eos_cdc_spark.sources.bucketing import bucketed_join, write_bucketed
from futures_eos_cdc_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge so the test proves bucket co-location, not broadcast;
    enable sorted bucket scans (off by default since SPARK-28589 — safe here
    because write_bucketed guarantees one sorted file per bucket)."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_ord = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", old_ord)


def test_bucketed_join_has_no_exchange_or_sort(spark, sf_dir, tmp_path, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "t_li_b", ["l_orderkey"], 4, str(tmp_path / "li"))
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_o_b",
        ["l_orderkey"],
        4,
        str(tmp_path / "o"),
    )
    try:
        joined = bucketed_join(spark, "t_li_b", "t_o_b", ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: shuffle paid at write time
        assert "Sort" not in plan.replace("SortMergeJoin", "")  # sortBy removed sorts
        # and the result is right
        n = joined.count()
        assert n == li.count()  # every lineitem matches exactly one order
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_groupby_on_bucket_key_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "t_li_g", ["l_orderkey"], 4, str(tmp_path / "lig"))
    try:
        agg = (
            spark.table("t_li_g")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_g")


def test_partitioned_layout_prunes_directories(spark, sf_dir, tmp_path):
    """Filters on partition columns must become PartitionFilters (planning-
    time directory pruning), not data filters — and prune to one partition."""
    from futures_eos_cdc_spark.sources.bucketing import (
        read_partition_pruned,
        write_partitioned,
    )
    from futures_eos_cdc_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_priority")
    # disable AQE's small-partition merge for the write so the spread
    # mechanism (the at-scale file-size bound) is observable on tiny data
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        write_partitioned(orders, path, ["o_orderpriority"], files_per_partition=2)
    finally:
        spark.conf.set(key, old)

    back = read_partition_pruned(spark, path)
    one = back.filter(back.o_orderpriority == "1-URGENT")
    # formatted mode prints untruncated scan metadata (PartitionFilters /
    # partition counts); toString() clips at maxMetadataStringLength
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # row parity with the unpartitioned source
    assert one.count() == orders.filter(orders.o_orderpriority == "1-URGENT").count()
    # small-files guard: AT MOST 2 files per directory (spread = content
    # hash mod 2; a task-assignment collision can merge the two), and the
    # spread demonstrably splits at least one directory
    import os

    counts = []
    for d in os.listdir(path):
        if d.startswith("o_orderpriority="):
            pdir = os.path.join(path, d)
            counts.append(
                len([f for f in os.listdir(pdir) if f.endswith(".parquet")])
            )
    assert counts and all(1 <= c <= 2 for c in counts)
    assert max(counts) == 2


def test_zorder_layout_beats_single_column_sort_for_skipping(spark, sf_dir, tmp_path):
    """The point of z-order: with files holding contiguous zkey ranges,
    file-level min/max prune usefully on BOTH interleaved columns, while a
    single-column sort prunes perfectly on one and not at all on the other.
    Measured as files whose [min,max] intersect each predicate's range."""
    import os

    import pyarrow.parquet as pq

    from futures_eos_cdc_spark.plans import QUERIES

    keyed = QUERIES["zorder_layout_key"](spark, sf_dir)

    def write_sorted(df, col, out):
        (df.repartitionByRange(16, col).sortWithinPartitions(col)
           .write.mode("overwrite").parquet(out))

    def files_touched(out, col, lo, hi):
        touched = 0
        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                mins.append(st.min); maxs.append(st.max)
            if min(mins) <= hi and max(maxs) >= lo:
                touched += 1
        return touched

    zo, ps = str(tmp_path / "zo"), str(tmp_path / "ps")
    write_sorted(keyed, "zkey", zo)
    write_sorted(keyed, "price_bucket", ps)

    # one selective predicate per dimension (1/16th of each value range)
    cost = {}
    for name, out in (("zorder", zo), ("price_sorted", ps)):
        cost[name] = (
            files_touched(out, "price_bucket", 64, 79)
            + files_touched(out, "size_bucket", 100, 115)
        )
    # price-sorted: ~1 file for the price slice but ALL files for the size
    # slice; z-order pays a few files on each — strictly fewer in total
    assert cost["zorder"] < cost["price_sorted"], cost


def test_manifest_prunes_files_and_preserves_results(spark, sf_dir, tmp_path):
    """Footer-stats data skipping: over a range-clustered layout, a range
    predicate must (a) return exactly the rows a full-scan filter returns,
    (b) admit only the files whose footer min/max overlap the range, and
    (c) read zero data files when the range misses everything."""
    from futures_eos_cdc_spark.sources.manifest import (
        build_scan_manifest,
        manifest_pruned_read,
        prune_files,
    )

    out = str(tmp_path / "orders_by_price")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_custkey"
    )
    # range-cluster: repartitionByRange gives files disjoint o_totalprice
    # ranges — the layout zorder/sort produces at scale
    orders.repartitionByRange(8, "o_totalprice").sortWithinPartitions(
        "o_totalprice"
    ).write.parquet(out)

    manifest = build_scan_manifest(spark, out, ["o_totalprice"])
    n_files = len({e["file"] for e in manifest})
    assert n_files == 8

    lo, hi = 50_000.0, 80_000.0
    keep = prune_files(manifest, {"o_totalprice": (lo, hi)})
    assert 0 < len(keep) < n_files  # real skipping happened

    got = manifest_pruned_read(spark, out, {"o_totalprice": (lo, hi)}, manifest)
    want = orders.filter(
        (orders.o_totalprice >= lo) & (orders.o_totalprice <= hi)
    )
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    )

    # an impossible range prunes every file but keeps the schema
    nothing = manifest_pruned_read(
        spark, out, {"o_totalprice": (1e12, None)}, manifest
    )
    assert nothing.columns == ["o_orderkey", "o_totalprice", "o_custkey"]
    assert nothing.count() == 0

    # conservative admission: a column with no stats never skips
    assert (
        len(prune_files(manifest, {"no_such_col": (0, 1)})) == n_files
    )


def test_manifest_incremental_refresh(spark, sf_dir, tmp_path):
    """Appending files must cost only the NEW footers: refresh merges new
    entries, keeps old ones verbatim, and drops entries for deleted files."""
    from futures_eos_cdc_spark.sources.manifest import (
        build_scan_manifest,
        prune_files,
        refresh_scan_manifest,
    )

    out = str(tmp_path / "inc")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    orders.limit(100).coalesce(1).write.parquet(out)
    m1 = build_scan_manifest(spark, out, ["o_totalprice"])
    # append a second batch of files
    orders.where("o_orderkey % 2 = 0").limit(100).coalesce(2).write.mode(
        "append"
    ).parquet(out)
    m2 = refresh_scan_manifest(spark, out, ["o_totalprice"], m1)
    full = build_scan_manifest(spark, out, ["o_totalprice"])
    key = lambda e: e["file"]
    assert sorted(m2, key=key) == sorted(full, key=key)
    assert {e["file"] for e in m1} <= {e["file"] for e in m2}
    # pruning over the refreshed manifest matches a full rebuild
    r = {"o_totalprice": (None, 100_000.0)}
    assert prune_files(m2, r) == prune_files(full, r)
    # deleted files drop out
    import os as _os

    gone = sorted({e["file"] for e in m2})[0]
    _os.remove(gone)
    m3 = refresh_scan_manifest(spark, out, ["o_totalprice"], m2)
    assert gone not in {e["file"] for e in m3}


def test_manifest_stale_coverage_admits_unknown_files(spark, sf_dir, tmp_path):
    """r6 ADVICE #2: files appended AFTER the manifest was built have no
    stats — a pruned read over the stale manifest must ADMIT them (the
    conservative-admission contract extends to missing file entries), so
    results equal a full-scan filter instead of silently losing the
    appended rows."""
    from futures_eos_cdc_spark.sources.manifest import (
        build_scan_manifest,
        manifest_pruned_read,
        prune_files,
    )

    out = str(tmp_path / "stale")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    first = orders.where("o_totalprice < 100000")
    first.coalesce(2).write.parquet(out)
    stale = build_scan_manifest(spark, out, ["o_totalprice"])

    # append files the manifest has never seen — including rows that MATCH
    late = orders.where("o_totalprice >= 100000")
    assert late.count() > 0
    late.coalesce(1).write.mode("append").parquet(out)

    lo = 150_000.0
    got = manifest_pruned_read(spark, out, {"o_totalprice": (lo, None)}, stale)
    want = orders.filter(orders.o_totalprice >= lo)
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    )
    # and the stats-bearing files still skip: the stale manifest prunes
    # every covered file (all < 100k), so only the unknown file is read
    assert prune_files(stale, {"o_totalprice": (lo, None)}) == []
    assert len(set(got.inputFiles())) == 1
