"""Envelope stream sources (SURVEY §2.1 S1-S5).

The reference consumes a sharded RabbitMQ queue (`<queue>.0..MaxShard`
merged into one channel, nanachi consumer.go:223-315). In Spark the
shard set maps to source partitions:

  - Kafka: partitions ARE the shards; `kafka_envelope_source` builds
    the reader with prefetch parity (S2: maxOffsetsPerTrigger =
    batch x 10, reader/reader.go:98-104) and reconnection/offset
    tracking built in (S4 is free).
  - Files (tests / replay): newline-JSON files in a directory; Spark's
    file source gives exactly-once file tracking via the checkpoint.
  - RabbitMQ: no first-party Spark connector. The supported bridges
    are (a) rabbitmq -> kafka mirror, or (b) a DataSourceV2 streaming
    source honoring per-shard offsets — deliberately NOT implemented
    here (would be custom connector code, SURVEY §4); the pipeline is
    source-agnostic beyond the `body` column.

Every source yields a streaming DataFrame with at minimum:
  body STRING   -- raw envelope JSON
plus source metadata (shard/offset/delivery_id) when available —
FIXTURES.md F1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ENVELOPE_STREAM_SCHEMA = "shard INT, offset BIGINT, body STRING, delivery_id STRING"


def file_envelope_source(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Newline-JSON envelope files (one object per line with fields of
    ENVELOPE_STREAM_SCHEMA). Used by tests and replay jobs."""
    reader = spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    batch_size: int = 1000,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Kafka source options with reference-parity prefetch: the AMQP
    QoS window was batch x 10 (reader/reader.go:98-104) ->
    maxOffsetsPerTrigger. Exposed as a dict so tests can assert on it
    without a broker."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(batch_size * 10),
        "failOnDataLoss": "false",
    }
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def kafka_envelope_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    batch_size: int = 1000,
    **kwargs,
) -> DataFrame:
    """Kafka envelope stream: value -> body, partition -> shard,
    offset/delivery id from Kafka coordinates (at-least-once identity)."""
    from pyspark.sql import functions as F

    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap_servers, topic, batch_size, **kwargs).items():
        reader = reader.option(k, v)
    raw = reader.load()
    return raw.select(
        F.col("partition").cast("int").alias("shard"),
        F.col("offset").alias("offset"),
        F.col("value").cast("string").alias("body"),
        F.concat_ws("-", "topic", "partition", "offset").alias("delivery_id"),
    )


DEFAULT_NUM_SHARDS = 3  # maxShard: 2 hardcoded (etc/corrie.yml:25, README.md:70)


def assign_shard(
    df: DataFrame,
    num_shards: int = DEFAULT_NUM_SHARDS,
    sticky_key: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Produce-side shard assignment (M5, producer.go:143-163): a
    `shard` column in [0, num_shards) — uniform random per message by
    default, or sticky by key hash (the x-shard header contract:
    same key -> same shard, preserving per-key FIFO like the
    reference's per-queue ordering).

    The column IS the Kafka partition when publishing (write the
    shard as the message key or partition id); downstream
    repartition(num_shards, 'shard') co-locates without a second
    shuffle at the sink.
    """
    from pyspark.sql import functions as F

    if sticky_key is None:
        shard = F.floor(F.rand(seed) * num_shards).cast("int")
    else:
        shard = F.pmod(F.xxhash64(F.col(sticky_key)), F.lit(num_shards)).cast("int")
    return df.withColumn("shard", shard)
