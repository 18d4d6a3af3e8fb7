"""StreamingQueryListener progress recorder: the reference's eos-monitor
throughput/state probes answered from in-process progress events."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from futures_eos_cdc_spark.operators.signal_pipeline import signals_from_events
from futures_eos_cdc_spark.sources.tables import load_table
from futures_eos_cdc_spark.streaming.monitor import attach_progress_recorder
from futures_eos_cdc_spark.streaming.pipeline import (
    read_signal_stream_files,
    streaming_decide,
)

SENTINEL_TS_US = 4102444800 * 1_000_000


def test_progress_recorder_captures_throughput_and_state(spark, sf_dir, tmp_path):
    sig = signals_from_events(load_table(spark, sf_dir, "events"))
    sentinel = spark.createDataFrame(
        [(999_999_999, "SENTINEL", "BUY", 0.1, 1.0, "1m", SENTINEL_TS_US)],
        "signal_id long, symbol string, side string, qty double, price double,"
        " timeframe string, ts_us long",
    )
    n_input = sig.count() + 1
    path = str(tmp_path / "mon_in")
    sig.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(path)

    rec = attach_progress_recorder(spark)
    try:
        q = (
            streaming_decide(read_signal_stream_files(spark, path))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("monitored")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # listener events are delivered asynchronously post-batch
        deadline = time.time() + 30
        while time.time() < deadline:
            if rec.totals()["total_input_rows"] >= n_input:
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(rec)

    t = rec.totals()
    assert t["n_triggers"] >= 1
    assert t["total_input_rows"] == n_input  # every signal accounted for
    assert t["peak_state_rows"] > 0  # windowed agg holds state
    assert t["peak_rows_per_sec"] > 0

    rows = rec.report(spark).filter(F.col("name") == "monitored")
    assert rows.count() == t["n_triggers"]
    assert rows.filter(F.col("num_input_rows") > 0).count() >= 1
