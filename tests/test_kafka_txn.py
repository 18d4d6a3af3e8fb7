"""Unit-test the transactional Kafka foreachBatch writer with a stub
producer (confluent-kafka is absent in this container — this pins the
begin/produce/commit/abort protocol the real producer would execute,
mirroring the reference's EXACTLY_ONCE_V2 guarantee, KafkaConfig.kt:25-30)."""

import json

import pytest

from futures_eos_cdc_spark.sources.kafka import kafka_txn_decisions_writer


class StubTxnProducer:
    """confluent-kafka transactional surface; records the protocol and can
    inject a failure on the Nth produce."""

    def __init__(self, config, fail_at=None):
        self.config = config
        self.fail_at = fail_at
        self.log: list = []
        self.visible: list = []  # what a read_committed consumer sees
        self._pending: list = []
        self._n = 0

    def init_transactions(self):
        self.log.append("init")

    def begin_transaction(self):
        self.log.append("begin")
        self._pending = []

    def produce(self, topic, key=None, value=None):
        self._n += 1
        if self.fail_at is not None and self._n >= self.fail_at:
            raise RuntimeError("broker went away")
        self.log.append("produce")
        self._pending.append((topic, key, value))

    def commit_transaction(self):
        self.log.append("commit")
        self.visible.extend(self._pending)
        self._pending = []

    def abort_transaction(self):
        self.log.append("abort")
        self._pending = []


def _decisions(spark, n=4):
    rows = [
        (f"SYM{i}", 1_700_000_000 + 300 * i, "BUY", 0.8, 101.5, 3.0, f"id{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, window_start_s long, action string, confidence double,"
        " suggested_price double, suggested_qty double, id string",
    )


def test_commit_publishes_whole_batch(spark):
    captured = {}

    def factory(config):
        captured["p"] = StubTxnProducer(config)
        return captured["p"]

    write = kafka_txn_decisions_writer("b:9092", producer_factory=factory)
    write(_decisions(spark), epoch_id=0)
    p = captured["p"]
    assert p.log[:2] == ["init", "begin"] and p.log[-1] == "commit"
    assert len(p.visible) == 4
    # wire format: key = symbol, value = JSON without window_start_s
    topic, key, value = p.visible[0]
    assert topic == "trading.decisions"
    payload = json.loads(value)
    assert key == payload["symbol"] and "window_start_s" not in payload
    # transactional config reached the producer
    assert p.config["transactional.id"] == "futures-eos-cdc-spark-decisions"
    assert p.config["enable.idempotence"] is True


def test_partial_failure_aborts_and_nothing_visible(spark):
    captured = {}

    def factory(config):
        captured["p"] = StubTxnProducer(config, fail_at=3)
        return captured["p"]

    write = kafka_txn_decisions_writer("b:9092", producer_factory=factory)
    with pytest.raises(RuntimeError, match="broker went away"):
        write(_decisions(spark), epoch_id=0)
    p = captured["p"]
    assert p.log[-1] == "abort" and "commit" not in p.log
    assert p.visible == []  # read_committed consumer sees no partial batch


def test_one_transaction_per_batch_one_init_total(spark):
    captured = {}

    def factory(config):
        captured["p"] = StubTxnProducer(config)
        return captured["p"]

    write = kafka_txn_decisions_writer("b:9092", producer_factory=factory)
    write(_decisions(spark, 2), epoch_id=0)
    write(_decisions(spark, 3), epoch_id=1)
    p = captured["p"]
    assert p.log.count("init") == 1  # producer reused across batches
    assert p.log.count("begin") == p.log.count("commit") == 2
    assert len(p.visible) == 5


def test_missing_client_lib_raises_actionable_error(spark):
    write = kafka_txn_decisions_writer("b:9092")
    with pytest.raises(RuntimeError, match="confluent-kafka"):
        write(_decisions(spark), epoch_id=0)
