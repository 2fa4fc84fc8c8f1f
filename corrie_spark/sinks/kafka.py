"""Kafka producer/DLQ sink configuration (K11 forward, K13 confirmed
publish — SURVEY §2.4).

The reference re-publishes failed raw bodies to a `failed` queue with
persistent delivery (reader/reader.go:167-179) and relies on
publisher confirms with automatic re-send on nack/return
(smart_producer.go:61-150). On Kafka both are configuration:
`acks=all` + idempotent producer IS the confirmed-publish contract
(broker-acknowledged, deduped retries), and the DLQ is just a topic.

No broker runs in the test environment; these builders are exercised
on their option dicts and output projections, and satisfy the same
Sink protocol as the parquet/JDBC sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_writer_options(
    bootstrap_servers: str,
    topic: str,
    confirmed: bool = True,
) -> dict[str, str]:
    """Writer options; `confirmed` applies the K13 reliability pair
    (acks=all + idempotence) — leave on unless loss is acceptable."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
    if confirmed:
        opts["kafka.acks"] = "all"
        opts["kafka.enable.idempotence"] = "true"
    return opts


def to_kafka_records(
    df: DataFrame,
    value_col: str = "body",
    key_col: str | None = "shard",
) -> DataFrame:
    """Project to the Kafka sink schema (key, value). Keying by shard
    preserves the reference's per-shard FIFO (messages with the same
    shard land in the same partition, in order)."""
    value = F.col(value_col).cast("string").alias("value")
    if key_col is None:
        return df.select(value)
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def dlq_to_kafka_records(dlq_df: DataFrame) -> DataFrame:
    """Project a DLQ frame to the Kafka record schema. DLQ frames
    carry (raw_body, reason) — the contract shared by
    envelope.split_dlq, the writer's dlq batches, and DLQSink.SCHEMA."""
    return to_kafka_records(
        dlq_df.withColumn(
            "body",
            F.to_json(F.struct(F.col("raw_body").alias("raw"), F.col("reason"))),
        ),
        key_col=None,
    )


def write_dlq_to_kafka(
    dlq_df: DataFrame,
    bootstrap_servers: str,
    topic: str = "failed",
) -> None:
    """Batch-append DLQ rows (raw body + reason) to the failed topic —
    the K11 forward. Called from inside foreachBatch, so offsets
    commit only after this returns (ack-after-forward, K10)."""
    records = dlq_to_kafka_records(dlq_df)
    writer = records.write.format("kafka")
    for k, v in kafka_writer_options(bootstrap_servers, topic).items():
        writer = writer.option(k, v)
    writer.save()
