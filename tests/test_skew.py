"""Salting must change the exchange layout, never the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from futures_eos_cdc_spark.operators.skew import salted_aggregate, salted_join
from futures_eos_cdc_spark.sources.tables import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag,): (r.qty, r.n, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.qty, r.n, r.mx)
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {"qty": ("l_quantity", "sum"), "n": ("*", "count"), "mx": ("l_extendedprice", "max")},
        ).collect()
    }
    assert set(plain) == set(salted)
    for k, (q, n, mx) in plain.items():
        sq, sn, smx = salted[k]
        assert n == sn and mx == smx, k
        assert abs(q - sq) < 1e-6 * max(abs(q), 1.0), k  # float sum order differs


def test_salted_aggregate_is_two_stage(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = salted_aggregate(li, ["l_returnflag"], {"n": ("*", "count")}, n_salts=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two logical aggregations → 4 HashAggregates (partial+final each)
    assert plan.count("HashAggregate") >= 4
    assert df.count() == 3  # A/N/R — salt never leaks into the result


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, ["l_orderkey"]).groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, o, ["l_orderkey"], n_salts=8)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_and_full(spark, sf_dir):
    # right/full would emit every unmatched replicated-small-side row
    # n_salts times — the API must refuse rather than silently corrupt.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    import pytest

    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(li, o, ["l_orderkey"], n_salts=4, how=how)


def test_salted_join_left_matches_plain(spark, sf_dir):
    # left outer is allowed: the salted big side carries one salt per row,
    # so unmatched big rows emit exactly once.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    plain = li.join(o, ["l_orderkey"], "left").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, o, ["l_orderkey"], n_salts=8, how="left")
        .groupBy("o_orderpriority")
        .count()
    )
    key = lambda rows: sorted(map(tuple, rows), key=repr)  # noqa: E731 (None keys)
    assert key(plain.collect()) == key(salted.collect())


def test_duplicate_rows_disperse_across_partitions(spark, sf_dir):
    # The viral-document case: byte-identical rows spread over the input
    # partitions must NOT all collapse onto one salt (a content-only hash
    # would put them all on one reducer). The guarantee is deliberately
    # per-PARTITION — the salt mixes spark_partition_id(), never a row
    # counter, so a map-task retry reproduces identical salts
    # (SPARK-23207-class indeterminate-stage safety). Same-partition
    # duplicates sharing a salt is the accepted bound.
    from futures_eos_cdc_spark.operators.skew import _salt_expr

    dup = (
        spark.range(2000)
        .repartition(32)
        .select(F.lit("same").alias("k"), F.lit("x").alias("v"))
    )
    n = dup.select(_salt_expr(dup, 16).alias("s")).distinct().count()
    assert n >= 8, f"identical rows collapsed onto {n} salts"


def test_salt_is_deterministic_across_recomputation(spark, sf_dir):
    # Same deterministic scan → identical salt histogram on every run.
    from futures_eos_cdc_spark.operators.skew import _salt_expr

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    h1 = sorted(map(tuple, li.select(_salt_expr(li, 16).alias("s")).groupBy("s").count().collect()))
    h2 = sorted(map(tuple, li.select(_salt_expr(li, 16).alias("s")).groupBy("s").count().collect()))
    assert h1 == h2
