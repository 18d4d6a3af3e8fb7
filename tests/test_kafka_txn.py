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

    def poll(self, timeout=0):
        # confluent-kafka surface: services delivery callbacks; the writer
        # calls poll(0) per produce (and blocks here on BufferError).
        self.log.append("poll")
        return 0


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


# ---------------------------------------------------------------------------
# Key-range-parallel writer (N producers over disjoint ranges). The produce
# loop runs in executor Python workers, so the stub records transactions
# DURABLY: commit = atomic tmp-write + rename of a JSON file per
# transaction; abort = a marker file. The test process reads the directory.
# ---------------------------------------------------------------------------
import functools
import os
import uuid


class FileTxnProducer:
    """confluent-kafka transactional surface, file-backed for cross-process
    observation. A transaction becomes visible only via the atomic rename in
    commit_transaction — exactly the read_committed contract."""

    def __init__(self, config, outdir=None, fail_range=None):
        self.config = config
        self.outdir = outdir
        self.tid = config["transactional.id"]
        self.range = int(self.tid.rsplit("-", 1)[1])
        self.fail_range = fail_range
        self._pending = []

    def init_transactions(self):
        with open(os.path.join(self.outdir, f"init-{self.tid}-{uuid.uuid4().hex}"), "w"):
            pass

    def begin_transaction(self):
        self._pending = []

    def produce(self, topic, key=None, value=None):
        if self.fail_range is not None and self.range == self.fail_range:
            raise RuntimeError("range broker went away")
        self._pending.append([topic, key, value])

    def commit_transaction(self):
        tmp = os.path.join(self.outdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"tid": self.tid, "records": self._pending}, f)
        os.rename(tmp, os.path.join(self.outdir, f"commit-{self.tid}-{uuid.uuid4().hex}.json"))
        self._pending = []

    def abort_transaction(self):
        with open(os.path.join(self.outdir, f"abort-{self.tid}-{uuid.uuid4().hex}"), "w"):
            pass
        self._pending = []

    def poll(self, timeout=0):
        return 0


def _committed(outdir):
    out = []
    for name in os.listdir(outdir):
        if name.startswith("commit-"):
            with open(os.path.join(outdir, name)) as f:
                out.append(json.load(f))
    return out


def test_parallel_writer_disjoint_ranges_cover_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from futures_eos_cdc_spark.sources.kafka import (
        kafka_txn_decisions_writer_parallel,
    )

    outdir = str(tmp_path)
    write = kafka_txn_decisions_writer_parallel(
        "b:9092",
        n_writers=3,
        # unique per test: the per-worker producer cache keys on
        # transactional.id, and a cached producer pins its outdir
        transactional_id_prefix=f"txn-{uuid.uuid4().hex[:8]}",
        producer_factory=functools.partial(FileTxnProducer, outdir=outdir),
    )
    df = _decisions(spark, 12)
    write(df, epoch_id=0)

    txns = _committed(outdir)
    # every record exactly once across all committed transactions
    keys = [r[1] for t in txns for r in t["records"]]
    assert sorted(keys) == sorted(r["symbol"] for r in df.collect())
    # each transaction's tid matches the records' hash range, and ranges
    # are disjoint across tids (a key never appears under two tids)
    expected = {
        r["key"]: r["kr"]
        for r in df.select(
            F.col("symbol").alias("key"),
            F.pmod(F.xxhash64(F.col("symbol")), F.lit(3)).cast("int").alias("kr"),
        ).collect()
    }
    key_to_tid = {}
    for t in txns:
        rng = int(t["tid"].rsplit("-", 1)[1])
        for _, key, _v in t["records"]:
            assert expected[key] == rng
            assert key_to_tid.setdefault(key, t["tid"]) == t["tid"]
    # all three ranges produced (12 symbols hash over 3 ranges)
    assert {int(t["tid"].rsplit("-", 1)[1]) for t in txns} == set(expected.values())


def test_parallel_writer_failed_range_commits_nothing(spark, tmp_path):
    from futures_eos_cdc_spark.sources.kafka import (
        kafka_txn_decisions_writer_parallel,
    )

    outdir = str(tmp_path)
    write = kafka_txn_decisions_writer_parallel(
        "b:9092",
        n_writers=3,
        transactional_id_prefix=f"txn-{uuid.uuid4().hex[:8]}",
        producer_factory=functools.partial(
            FileTxnProducer, outdir=outdir, fail_range=1
        ),
    )
    with pytest.raises(Exception, match="range broker went away"):
        write(_decisions(spark, 12), epoch_id=0)
    # the failed range is atomically invisible: no commit file for tid -1;
    # other ranges may have committed independently (documented per-range
    # atomicity) — but range 1 must have nothing
    for t in _committed(outdir):
        assert not t["tid"].endswith("-1")
