"""Streaming integration tests: file-source streams driven to completion with
processAllAvailable() + memory sink — no Kafka needed (SURVEY.md §5).

Covers: windowed streaming decide (append mode), batch/streaming parity,
zero-grace late-row drops, duplicate-injection EOS semantics
(dropDuplicatesWithinWatermark), and the idempotent foreachBatch sink.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from futures_eos_cdc_spark.operators.signal_pipeline import (
    decide,
    signals_from_events,
)
from futures_eos_cdc_spark.sources.tables import load_table
from futures_eos_cdc_spark.streaming.outbox import (
    content_duplicate_report,
    parquet_orders_outbox_writer,
)
from futures_eos_cdc_spark.streaming.pipeline import (
    read_signal_stream_files,
    streaming_decide,
)

SENTINEL_TS_US = 4102444800 * 1_000_000  # year 2100 — pushes the watermark


def _signals(spark, sf_dir):
    return signals_from_events(load_table(spark, sf_dir, "events"))


def _write_stream_input(spark, sf_dir, tmp_path, extra_df=None):
    """Signals + a far-future sentinel row (append mode only emits a window
    once the watermark passes its end; the sentinel closes all real windows).
    """
    sig = _signals(spark, sf_dir)
    sentinel = spark.createDataFrame(
        [(999_999_999, "SENTINEL", "BUY", 0.1, 1.0, "1m", SENTINEL_TS_US)],
        "signal_id long, symbol string, side string, qty double, price double,"
        " timeframe string, ts_us long",
    )
    full = sig.unionByName(sentinel)
    if extra_df is not None:
        full = full.unionByName(extra_df)
    path = str(tmp_path / "stream_in")
    full.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, path, name, dedup=False):
    q = (
        streaming_decide(read_signal_stream_files(spark, path), dedup=dedup)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").filter(F.col("symbol") != "SENTINEL")


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    path = _write_stream_input(spark, sf_dir, tmp_path)
    stream_rows = {
        (r.symbol, r.window_start_s): r for r in _run_stream(spark, path, "sd1").collect()
    }
    batch_rows = {
        (r.symbol, r.window_start_s): r for r in decide(_signals(spark, sf_dir)).collect()
    }
    assert set(stream_rows) == set(batch_rows)
    # exact for ints/strings; small tolerance for floats: the streaming
    # array-fold rounds at the 9th decimal per add (see _dec_sum), the batch
    # path is decimal-exact — both deterministic, equal to ~1e-9 pre-rounding.
    exact_cols = ("n_timeframes", "n_signals", "balance", "alignment", "action", "reason")
    float_tols = {
        "avg_price": 1e-5,
        "avg_volatility": 1e-5,
        "confidence": 1e-5,
        "suggested_price": 1e-5,
        "suggested_qty": 2.1e-4,  # floor(x*1e4)/1e4 can flip one ulp of 1e-4
    }
    for key, b in batch_rows.items():
        s = stream_rows[key]
        for col in exact_cols:
            assert getattr(s, col) == getattr(b, col), (key, col)
        for col, tol in float_tols.items():
            assert abs(getattr(s, col) - getattr(b, col)) <= tol, (
                key, col, getattr(s, col), getattr(b, col))


def test_streaming_append_emits_one_decision_per_window(spark, sf_dir, tmp_path):
    path = _write_stream_input(spark, sf_dir, tmp_path)
    out = _run_stream(spark, path, "sd2")
    dups = content_duplicate_report(out, ["symbol", "window_start_s"])
    assert dups.count() == 0


def test_duplicate_injection_eos(spark, sf_dir, tmp_path):
    """The reference's EOS demo (scripts/eos-demo.sh): every signal injected
    5x byte-identically → with content dedup, decisions are identical to the
    single-copy run, and exactly one decision per (symbol, window)."""
    sig = _signals(spark, sf_dir)
    dup5 = sig.withColumn("dup", F.explode(F.array(*[F.lit(i) for i in range(5)]))).drop(
        "dup"
    )
    path = _write_stream_input(spark, sf_dir, tmp_path, extra_df=dup5.limit(0))
    # build the 5x-duplicated input (plus sentinel) in its own dir
    sentinel = spark.createDataFrame(
        [(999_999_999, "SENTINEL", "BUY", 0.1, 1.0, "1m", SENTINEL_TS_US)],
        "signal_id long, symbol string, side string, qty double, price double,"
        " timeframe string, ts_us long",
    )
    dup_path = str(tmp_path / "dup_in")
    dup5.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(dup_path)

    clean = {
        (r.symbol, r.window_start_s): r for r in _run_stream(spark, path, "sd3").collect()
    }
    deduped = {
        (r.symbol, r.window_start_s): r
        for r in _run_stream(spark, dup_path, "sd4", dedup=True).collect()
    }
    assert set(clean) == set(deduped)
    for key, c in clean.items():
        d = deduped[key]
        assert (c.action, c.confidence, c.balance, c.n_signals) == (
            d.action,
            d.confidence,
            d.balance,
            d.n_signals,
        ), key


def test_late_rows_dropped_with_zero_grace(spark, sf_dir, tmp_path):
    """Zero-grace watermark: rows older than the watermark never create or
    update windows (T1/T3)."""
    sig = _signals(spark, sf_dir)
    # one fresh row advances the watermark to 2100; then replay real signals
    sentinel_first = spark.createDataFrame(
        [(999_999_999, "SENTINEL", "BUY", 0.1, 1.0, "1m", SENTINEL_TS_US)],
        "signal_id long, symbol string, side string, qty double, price double,"
        " timeframe string, ts_us long",
    )
    path = str(tmp_path / "late_in")
    os.makedirs(path, exist_ok=True)
    sentinel_first.coalesce(1).write.mode("overwrite").parquet(path + "/batch0")

    q = (
        streaming_decide(
            read_signal_stream_files(spark, path + "/batch*"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late1")
        .start()
    )
    try:
        q.processAllAvailable()  # watermark advances past 2100-window start
        sig.coalesce(1).write.mode("overwrite").parquet(path + "/batch1")
        q.processAllAvailable()  # all real (2024) rows are now late → dropped
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM late1").filter(F.col("symbol") != "SENTINEL")
    assert out.count() == 0


def test_foreach_batch_sink_idempotent(spark, sf_dir, tmp_path):
    """Replaying the same micro-batch must not duplicate rows (T8: the
    at-least-once + unique-key contract)."""
    from futures_eos_cdc_spark.operators.order_pipeline import (
        decisions_to_orders,
        market_prices_df,
    )

    decisions = decide(_signals(spark, "/root/testdata/sf0.01"))
    orders = decisions_to_orders(decisions, market_prices_df(spark))
    base = str(tmp_path / "sink")
    writer = parquet_orders_outbox_writer(base)
    writer(orders, epoch_id=0)
    n1 = spark.read.parquet(base + "/orders").count()
    assert n1 > 0
    writer(orders, epoch_id=0)  # replayed epoch
    writer(orders, epoch_id=1)  # same data, new epoch
    n2 = spark.read.parquet(base + "/orders").count()
    assert n2 == n1


@pytest.mark.parametrize("key_cols", [["symbol", "side", "price", "qty", "timeframe", "ts_us"]])
def test_content_duplicate_report(spark, sf_dir, key_cols):
    sig = _signals(spark, sf_dir)
    dup = sig.unionByName(sig.limit(3))
    rep = content_duplicate_report(dup, key_cols)
    assert rep.count() == 3
    assert rep.agg(F.max("n")).collect()[0][0] == 2
