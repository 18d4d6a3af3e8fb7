"""P17/S3: synthetic signal generation (the reference's signal-generator app).

Batch analogue of apps/signal-generator/.../Main.kt:100-115: price =
base*(1 ± 0.3% uniform), side ~ Bernoulli(0.5), qty ~ U(0.01, 0.5), symbols
and timeframes uniform — all as seeded ``rand(seed)`` expressions, so a given
(n, seed, base_ts_us) is fully deterministic and test-stable.

One narrow projection over ``spark.range`` — embarrassingly parallel, no
shuffle; the continuous variant is streaming.pipeline.read_signal_stream_rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_PRICES = {
    "BTCUSDT": 65000.0,
    "ETHUSDT": 3000.0,
    "SOLUSDT": 160.0,
    "XRPUSDT": 0.6,
    "NAS100": 20000.0,
}


def generate_signals(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    base_ts_us: int = 1_704_067_200_000_000,  # 2024-01-01 UTC
    rate_per_sec: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """n synthetic signals at rate_per_sec, schema-compatible with
    signals_from_events output (signal_id, symbol, side, qty, price,
    timeframe, ts_us)."""
    ids = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    sym_idx = (F.rand(seed) * 5).cast("int")
    symbols = list(BASE_PRICES)
    symbol = (
        F.when(sym_idx == 0, symbols[0])
        .when(sym_idx == 1, symbols[1])
        .when(sym_idx == 2, symbols[2])
        .when(sym_idx == 3, symbols[3])
        .otherwise(symbols[4])
    )
    base = (
        F.when(sym_idx == 0, BASE_PRICES[symbols[0]])
        .when(sym_idx == 1, BASE_PRICES[symbols[1]])
        .when(sym_idx == 2, BASE_PRICES[symbols[2]])
        .when(sym_idx == 3, BASE_PRICES[symbols[3]])
        .otherwise(BASE_PRICES[symbols[4]])
    )
    tf_idx = (F.rand(seed + 1) * 3).cast("int")
    return ids.select(
        F.col("id").alias("signal_id"),
        symbol.alias("symbol"),
        F.when(F.rand(seed + 2) < 0.5, "BUY").otherwise("SELL").alias("side"),
        (F.rand(seed + 3) * 0.49 + 0.01).alias("qty"),
        (base * (1.0 + (F.rand(seed + 4) - 0.5) * 0.006)).alias("price"),
        F.when(tf_idx == 0, "1m").when(tf_idx == 1, "5m").otherwise("15m").alias(
            "timeframe"
        ),
        (F.lit(base_ts_us) + (F.col("id") * (1_000_000 / rate_per_sec)).cast("long")).alias(
            "ts_us"
        ),
    )
