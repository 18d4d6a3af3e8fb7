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

    def _default_factory(config: dict):
        try:
            import confluent_kafka  # noqa: PLC0415 — optional dependency
        except ModuleNotFoundError as exc:
            raise RuntimeError(
                "transactional Kafka sink needs confluent-kafka (or an "
                "injected producer_factory with the same transactional "
                "surface)"
            ) from exc
        return confluent_kafka.Producer(config)

    make = producer_factory or _default_factory
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
                producer.produce(topic, key=row["key"], value=row["value"])
            producer.commit_transaction()
        except Exception:
            # Abort-on-partial-failure: nothing from this batch becomes
            # visible; Spark retries the whole batch from the checkpoint.
            producer.abort_transaction()
            raise

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
