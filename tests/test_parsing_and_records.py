"""Tests for the wire-format edges: lenient JSON signal parsing (P1),
Debezium envelope parsing (S7a), outbox payload round-trip (P14), full
decision record construction (D6), Kafka record projection (S2/P4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from futures_eos_cdc_spark.operators.order_pipeline import (
    decisions_to_orders,
    market_prices_df,
    orders_to_outbox,
    outbox_event_router,
    parse_debezium_envelope,
)
from futures_eos_cdc_spark.operators.signal_pipeline import (
    decide,
    parse_signals,
    signals_from_events,
    to_decision_records,
)
from futures_eos_cdc_spark.sources.kafka import decisions_to_kafka_records
from futures_eos_cdc_spark.sources.tables import load_table

GOOD = '{"symbol":"BTCUSDT","side":"BUY","qty":0.23,"price":65123.45,"timeframe":"1m","ts":1765500000000}'
EXTRA = '{"symbol":"ETHUSDT","side":"SELL","qty":0.1,"price":3000.0,"timeframe":"5m","ts":1765500000001,"test_id":"eos-1","duplicate_test":true}'
MALFORMED = '{"symbol":"BTCUSDT","side":"BUY",'
WRONG_TYPE = '{"symbol":"SOLUSDT","side":"BUY","qty":"not-a-number","price":160.0,"timeframe":"15m","ts":1765500000002}'
NULL_SYMBOL = '{"side":"BUY","qty":0.2,"price":1.0,"timeframe":"1m","ts":1765500000003}'


def test_parse_signals_lenient(spark):
    raw = spark.createDataFrame(
        [(GOOD,), (EXTRA,), (MALFORMED,), (WRONG_TYPE,), (NULL_SYMBOL,)], "value string"
    )
    out = parse_signals(raw).collect()
    # malformed dropped; unknown fields ignored; missing symbol dropped;
    # wrong-typed field nulls the field but keeps the record (from_json
    # partial-parse) — matching lenient Jackson + drop-on-error semantics
    symbols = sorted(r.symbol for r in out)
    assert symbols == ["BTCUSDT", "ETHUSDT", "SOLUSDT"]
    by_sym = {r.symbol: r for r in out}
    assert by_sym["ETHUSDT"].qty == 0.1  # extra fields didn't break parsing
    assert by_sym["SOLUSDT"].qty is None  # wrong type → null field
    assert all(r.processed_at is not None for r in out)  # P2 enrichment


def test_debezium_envelope_parse(spark):
    after = {"event_id": "e1", "aggregate_id": "a1", "payload": "{}"}
    rows = [
        (json.dumps({"payload": {"after": after, "op": "c", "ts_ms": 123,
                                 "source": {"table": "outbox", "lsn": 9}}}),),
        (json.dumps({"payload": {"after": None, "op": "d", "ts_ms": 124,
                                 "source": {"table": "outbox", "lsn": 10}}}),),
        (None,),  # tombstone
        ("not json",),
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = parse_debezium_envelope(raw).collect()
    assert len(out) == 1
    assert out[0].after["event_id"] == "e1"
    assert out[0].op == "c"
    assert out[0].ts_ms == 123


def _orders(spark):
    decisions = decide(signals_from_events(load_table(spark, "/root/testdata/sf0.01", "events")))
    return decisions_to_orders(decisions, market_prices_df(spark))


def test_outbox_payload_roundtrip(spark):
    outbox = orders_to_outbox(_orders(spark))
    rows = outbox.collect()
    assert len(rows) > 0
    for r in rows[:5]:
        payload = json.loads(r.payload)
        assert set(payload) == {
            "orderId", "clientOrderId", "symbol", "side", "qty", "price",
            "status", "confidence",
        }
        assert payload["orderId"] == r.aggregate_id
        assert r.occurred_at_ms == r.occurred_at_s * 1000  # P15 generated col
        assert r.aggregate_type == "ORDER" and r.type == "ORDER_CREATED"


def test_outbox_event_router_projection(spark):
    routed = outbox_event_router(orders_to_outbox(_orders(spark)))
    rows = routed.collect()
    assert len(rows) > 0
    for r in rows[:5]:
        assert r.topic == "trading.orders"
        assert json.loads(r.value)["orderId"] == r.key  # key ← aggregate_id
        assert r.header_event_type == "ORDER_CREATED"


def test_decision_records_embed_sorted_signals(spark):
    signals = signals_from_events(load_table(spark, "/root/testdata/sf0.01", "events"))
    decisions = decide(signals)
    recs = to_decision_records(decisions, signals).collect()
    assert len(recs) == decisions.count()
    for r in recs[:10]:
        assert len(r.id) == 64  # sha256 hex
        assert r.timestamp_s == r.window_start_s + 300
        sigs = r.signals
        assert len(sigs) > 0
        # A7: only the flattened last-10-per-timeframe buffers are embedded
        # (SignalAggregator.kt:42-44) — bounded at 3 timeframes x 10
        assert len(sigs) <= 30
        ts_list = [s.ts_us for s in sigs]
        assert ts_list == sorted(ts_list, reverse=True)  # most recent first
        assert all(s.symbol if hasattr(s, "symbol") else True for s in sigs)


def test_kafka_record_projection(spark):
    signals = signals_from_events(load_table(spark, "/root/testdata/sf0.01", "events"))
    recs = decisions_to_kafka_records(to_decision_records(decide(signals), signals))
    rows = recs.limit(5).collect()
    assert rows and set(recs.columns) == {"key", "value"}
    for r in rows:
        v = json.loads(r.value)
        assert v["symbol"] == r.key  # P4: key = symbol
        assert v["action"] in ("STRONG_BUY", "BUY", "HOLD", "SELL", "STRONG_SELL")
        assert isinstance(v["signals"], list)
