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
