from corrie_spark.sources.amqp import (
    AmqpShardedQueueReader,
    FakeAmqpBroker,
    register_amqp_sharded_queue,
)
from corrie_spark.sources.envelopes import (
    ENVELOPE_STREAM_SCHEMA,
    file_envelope_source,
    kafka_reader_options,
    kafka_envelope_source,
)

__all__ = [
    "ENVELOPE_STREAM_SCHEMA",
    "AmqpShardedQueueReader",
    "FakeAmqpBroker",
    "file_envelope_source",
    "kafka_reader_options",
    "kafka_envelope_source",
    "register_amqp_sharded_queue",
]
