"""S2/P4: Kafka sink projection + writer builder.

The decision stream is serialized exactly like the reference's producer
(SignalTopology.kt:76-81): key = symbol (P4 re-key), value = snake_case JSON
(JsonMapper.kt:17-22). The projection is pure-Spark and tested; the actual
``writeStream.format("kafka")`` needs the spark-sql-kafka package on the
classpath (gated — not bundled in this container).

At-least-once → effective exactly-once: decision ids are deterministic
(sha256 of symbol|window in deterministic mode), so downstream consumers
dedup replays by id — the §7.3 EOS design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decisions_to_kafka_records(decisions: DataFrame) -> DataFrame:
    """(key, value) projection for the `trading.decisions` topic."""
    value_cols = [
        c for c in decisions.columns if c not in ("window_start_s",)
    ]
    return decisions.select(
        F.col("symbol").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
    )


def _default_producer_factory(config: dict):
    try:
        import confluent_kafka  # noqa: PLC0415 — optional dependency
    except ModuleNotFoundError as exc:
        raise RuntimeError(
            "transactional Kafka sink needs confluent-kafka (or an "
            "injected producer_factory with the same transactional "
            "surface)"
        ) from exc
    return confluent_kafka.Producer(config)


def _produce_one(producer, topic: str, key, value) -> None:
    """Produce one record with local-queue backpressure handling.

    librdkafka's produce() is async into a bounded local queue
    (queue.buffering.max.messages, default ~100k): on a fat batch the queue
    fills and produce raises BufferError — and without poll() the delivery
    callbacks are never serviced, so the queue NEVER drains and every retry
    of the transaction hits the same wall. poll(0) each call services
    callbacks; on BufferError we block briefly in poll until space frees,
    then retry the same record.
    """
    while True:
        try:
            producer.produce(topic, key=key, value=value)
            break
        except BufferError:
            producer.poll(0.1)
    producer.poll(0)


def kafka_txn_decisions_writer(
    brokers: str,
    topic: str = "trading.decisions",
    transactional_id: str = "futures-eos-cdc-spark-decisions",
    producer_factory=None,
):
    """foreachBatch writer publishing each micro-batch inside ONE Kafka
    transaction — the Spark twin of the reference's
    ``processing.guarantee = EXACTLY_ONCE_V2`` (KafkaConfig.kt:25-30).

    Contract: a consumer at ``isolation.level=read_committed`` never
    observes a partial micro-batch — a batch that fails mid-produce is
    aborted and leaves no visible rows. Spark's checkpoint makes
    offsets+state progress atomic, the fixed ``transactional.id`` fences
    zombie producers after driver failover, and because decision records
    are deterministic (sha-derived ids), a replayed batch re-produces
    byte-identical rows — the read-process-write EOS shape of SURVEY §7.3.

    Scale note: one Kafka transaction implies ONE producer, so the produce
    loop runs on the driver (``toLocalIterator`` — bounded memory). The
    decision stream is post-aggregation (one row per symbol×window), tiny
    relative to the input; for fatter streams run N parallel writers over
    disjoint key ranges, each with its own transactional id.

    ``producer_factory(config) -> producer`` must return an object with the
    confluent-kafka transactional surface (init_transactions /
    begin_transaction / produce / commit_transaction / abort_transaction).
    Default resolves ``confluent_kafka.Producer`` (not shipped in this
    container); unit tests inject a stub — the same seam as
    ``streaming.outbox.partition_txn_writer``'s stub DB-API.
    """

    make = producer_factory or _default_producer_factory
    state: dict = {"producer": None}

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        if state["producer"] is None:
            candidate = make(
                {
                    "bootstrap.servers": brokers,
                    "transactional.id": transactional_id,
                    "enable.idempotence": True,
                }
            )
            # Cache only AFTER init_transactions succeeds: caching first
            # would pin a half-initialized producer and every retried batch
            # would then fail with a misleading transactional-state error
            # instead of re-attempting the init.
            candidate.init_transactions()
            state["producer"] = candidate
        producer = state["producer"]
        records = decisions_to_kafka_records(batch_df)
        producer.begin_transaction()
        try:
            for row in records.toLocalIterator():
                _produce_one(producer, topic, row["key"], row["value"])
            producer.commit_transaction()
        except Exception:
            # Abort-on-partial-failure: nothing from this batch becomes
            # visible; Spark retries the whole batch from the checkpoint.
            producer.abort_transaction()
            raise

    return write


# Per-process cache of initialized transactional producers, keyed by
# transactional.id. Executor Python workers are reused across tasks
# (spark.python.worker.reuse defaults true), so a key range's producer —
# and its one-time init_transactions() fencing round-trip — is paid once
# per worker process, not once per micro-batch.
_RANGE_PRODUCERS: dict = {}


def _range_producer(make, config: dict):
    key = config["transactional.id"]
    producer = _RANGE_PRODUCERS.get(key)
    if producer is None:
        candidate = make(config)
        # cache only after init succeeds (same rationale as the single-
        # writer path: never pin a half-initialized producer)
        candidate.init_transactions()
        _RANGE_PRODUCERS[key] = candidate
        producer = candidate
    return producer


def kafka_txn_decisions_writer_parallel(
    brokers: str,
    topic: str = "trading.decisions",
    n_writers: int = 4,
    transactional_id_prefix: str = "futures-eos-cdc-spark-decisions",
    producer_factory=None,
):
    """Key-range-parallel transactional foreachBatch writer: N producers
    over DISJOINT key ranges, one Kafka transaction per range per batch —
    the scale-out of ``kafka_txn_decisions_writer``'s documented
    single-driver-producer trade-off.

    Routing: range r = pmod(xxhash64(key), n_writers); ``repartition(n, r)``
    sends every row of a range to exactly one task, and
    ``sortWithinPartitions`` makes ranges contiguous so a task streams
    through its rows with O(1) memory, switching transactions at range
    boundaries. Each range owns a stable ``transactional.id``
    ("{prefix}-{r}"), so Kafka fences that range's zombies independently —
    the same EXACTLY_ONCE_V2 fencing contract as the reference
    (KafkaConfig.kt:25-30), now with produce bandwidth scaling in N.

    Atomicity is per (range, batch): a consumer at read_committed never
    sees a partial RANGE. Cross-range atomicity is intentionally not
    promised (Kafka transactions are per-producer); batch-level effective
    exactly-once still holds because a retried batch re-produces
    byte-identical deterministic records and committed duplicates dedup by
    id downstream — unchanged from the single-writer design (§7.3).

    Producers live in a per-worker-process cache keyed by transactional.id,
    so steady state pays zero init round-trips. All key ranges of a batch
    produce concurrently (one Spark task each).
    """
    make = producer_factory or _default_producer_factory

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        records = decisions_to_kafka_records(batch_df).withColumn(
            "kr", F.pmod(F.xxhash64("key"), F.lit(n_writers)).cast("int")
        )

        def produce_partition(rows) -> None:
            # txn_open tracks whether THIS producer has an uncommitted
            # transaction: after a range's commit_transaction() succeeds
            # the producer is back in Ready state, and calling
            # abort_transaction() on it would raise a _STATE error that
            # MASKS the root-cause exception (e.g. the NEXT range's broker
            # failure during init/begin).
            producer, current, txn_open = None, None, False
            try:
                for row in rows:
                    if row["kr"] != current:
                        if txn_open:
                            producer.commit_transaction()
                            txn_open = False
                        current = row["kr"]
                        producer = _range_producer(
                            make,
                            {
                                "bootstrap.servers": brokers,
                                "transactional.id": f"{transactional_id_prefix}-{current}",
                                "enable.idempotence": True,
                            },
                        )
                        producer.begin_transaction()
                        txn_open = True
                    _produce_one(producer, topic, row["key"], row["value"])
                if txn_open:
                    producer.commit_transaction()
                    txn_open = False
            except Exception:
                # Abort-on-partial-failure: nothing from the open range
                # becomes visible; Spark retries the batch. If the abort
                # ITSELF fails (broker unreachable, producer fenced), the
                # producer is wedged mid-transaction — evict it from the
                # per-process cache so the task retry builds a fresh one
                # (whose init_transactions() fences this zombie); keeping
                # it cached would wedge the key range for the life of the
                # reused worker process.
                if txn_open:
                    try:
                        producer.abort_transaction()
                    except Exception:
                        _RANGE_PRODUCERS.pop(
                            f"{transactional_id_prefix}-{current}", None
                        )
                raise

        (
            records.repartition(n_writers, "kr")
            .sortWithinPartitions("kr")
            .foreachPartition(produce_partition)
        )

    return write


def write_decisions_kafka(
    decisions: DataFrame,
    brokers: str,
    topic: str = "trading.decisions",
    checkpoint: str | None = None,
):
    """Start the kafka writeStream (requires kafka connector jars)."""
    writer = (
        decisions_to_kafka_records(decisions)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    try:
        return writer.start()
    except Exception as exc:  # pragma: no cover - needs kafka jars
        raise RuntimeError(
            "Kafka sink requires the spark-sql-kafka-0-10 package on the "
            "Spark classpath"
        ) from exc
