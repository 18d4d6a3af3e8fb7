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
