"""Canonical schemas for the engine's core record types.

Re-expressed from the reference's Kotlin data classes (SURVEY.md §1.2):

- ``Signal``    — reference/libs/common-model/src/main/kotlin/com/trading/model/Signal.kt:11-30
- ``TradingDecision`` — .../TradingDecision.kt:10-37 (snake_case JSON wire format,
  serde/JsonMapper.kt:17-22)
- ``Order`` / ``OutboxEvent`` — reference/deploy/postgres/configmap-init.yaml:11-46
  and apps/order-manager/.../model/Models.kt:15-35

The wire format everywhere is JSON with snake_case names; deserialization is
lenient (unknown fields ignored, malformed records dropped — Signal.kt:10,
JsonMapper.kt:20, SignalTopology.kt:93-100). ``from_json`` + null-filter
reproduces those semantics exactly (see operators.signal_pipeline.parse_signals).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Signal — the primary input stream record
# ---------------------------------------------------------------------------
SIGNAL_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("side", T.StringType(), False),  # BUY | SELL
        T.StructField("qty", T.DoubleType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("timeframe", T.StringType(), False),  # 1m | 5m | 15m
        T.StructField("ts", T.LongType(), False),  # epoch millis (event time)
        T.StructField("processed_at", T.TimestampType(), True),
    ]
)

# Lenient parse schema: same fields, everything nullable (from_json yields a
# null struct only on malformed JSON; missing fields become null columns).
SIGNAL_WIRE_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in SIGNAL_SCHEMA.fields]
)

SIDES = ("BUY", "SELL")
TIMEFRAMES = ("1m", "5m", "15m")

# Signal strength by timeframe (Signal.kt:23-29,36-41)
STRENGTH_BY_TIMEFRAME = {"1m": ("WEAK", 1), "5m": ("MEDIUM", 2), "15m": ("STRONG", 3)}
UNKNOWN_STRENGTH = ("UNKNOWN", 0)

# ---------------------------------------------------------------------------
# TradingDecision — the derived stream record
# ---------------------------------------------------------------------------
ACTIONS = ("STRONG_BUY", "BUY", "HOLD", "SELL", "STRONG_SELL")
# VOLUME_SPIKE is declared in the reference but never produced
# (TradingDecision.kt:31-37 vs DecisionMaker.kt:49-89).
REASONS = ("ALIGNED_SIGNALS", "DIVERGENT_SIGNALS", "INSUFFICIENT_DATA", "MOMENTUM_SHIFT")

DECISION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("action", T.StringType(), False),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("suggested_price", T.DoubleType(), True),
        T.StructField("suggested_qty", T.DoubleType(), True),
        T.StructField("signals", T.ArrayType(SIGNAL_SCHEMA), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("reason", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Order / Outbox — the relational sink tables
# ---------------------------------------------------------------------------
ORDER_STATUSES = ("PENDING", "FILLED", "PARTIALLY_FILLED", "CANCELED", "REJECTED")

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("client_order_id", T.StringType(), False),  # idempotency key
        T.StructField("symbol", T.StringType(), False),
        T.StructField("side", T.StringType(), False),
        T.StructField("qty", T.DecimalType(18, 8), False),
        T.StructField("price", T.DecimalType(18, 8), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

OUTBOX_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("aggregate_type", T.StringType(), False),
        T.StructField("aggregate_id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),  # JSON
        T.StructField("occurred_at", T.TimestampType(), False),
        T.StructField("occurred_at_ms", T.LongType(), False),  # generated column
    ]
)

# market price dim (OrderService.kt:42-47): broadcast-join lookup with default
MARKET_PRICES = {
    "BTCUSDT": 65000.0,
    "ETHUSDT": 3500.0,
    "SOLUSDT": 150.0,
    "NAS100": 18500.0,
}
DEFAULT_MARKET_PRICE = 100.0
