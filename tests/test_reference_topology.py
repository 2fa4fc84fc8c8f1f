"""The reference's deployment topology end-to-end with BOTH transports
live: an AMQP broker feeding the sharded-queue streaming source, the
micro-batch writer in the middle, and a ClickHouse-native-protocol
server receiving typed blocks over real sockets — RabbitMQ in,
ClickHouse out, exactly the corrie deployment a user would migrate
from. Every layer is the production code path; only the endpoints are
the in-process stand-ins (file-backed broker, socket-level server)."""

from __future__ import annotations

import json

import pytest

from corrie_spark.sinks import DLQSink, SchemaRegistry, WriterConfig
from corrie_spark.sinks.clickhouse_server import FakeClickHouseServer
from corrie_spark.sinks.native_tcp import NativeTcpSink
from corrie_spark.sources.amqp import FakeAmqpBroker, register_amqp_sharded_queue
from corrie_spark.streaming import PipelineConfig, start_pipeline

Q_SQL = "INSERT INTO db.metrics (m_id, m_value, m_tag) VALUES (?, ?, ?)"
SCHEMA = [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")]


@pytest.mark.usefixtures("spark")
def test_amqp_to_clickhouse_native_end_to_end(spark, tmp_path):
    broker_root = str(tmp_path / "broker")
    b = FakeAmqpBroker(broker_root)
    for i in range(30):
        b.publish(
            f"corrie.{i % 2}",
            json.dumps({"Query": Q_SQL, "Data": [str(i), str(i * 0.25), f"t{i % 3}"]}),
        )
    b.publish("corrie.1", "{poison")  # -> DLQ, raw body preserved

    register_amqp_sharded_queue(spark)
    with FakeClickHouseServer() as ch:
        ch.register_table("db.metrics", SCHEMA)
        ch.fail_next_inserts(1)  # one transient CH failure -> K9 retry
        src = (
            spark.readStream.format("amqp_sharded_queue")
            .option("broker", broker_root)
            .option("queue", "corrie")
            .option("shards", "2")
            .option("stateDir", str(tmp_path / "state"))
            .load()
        )
        q = start_pipeline(
            src,
            NativeTcpSink([f"127.0.0.1:{ch.port}"]),
            DLQSink(str(tmp_path / "dlq")),
            SchemaRegistry({"db.metrics": SCHEMA}),
            PipelineConfig(
                checkpoint_dir=str(tmp_path / "ckpt"),
                available_now=True,
                writer=WriterConfig(retry_interval_s=0.01, max_retries=2),
            ),
        )
        q.awaitTermination(120)

        got = sorted(ch.rows("db.metrics"))
        assert [r[0] for r in got] == list(range(30))  # all landed, exactly once
        assert got[4] == (4, 1.0, "t1")  # typed end to end
        dlq = spark.read.schema(DLQSink.SCHEMA).parquet(str(tmp_path / "dlq"))
        [row] = dlq.collect()
        assert row["reason"] == "parse_error" and row["raw_body"] == "{poison"
        # the broker-side unacked window exists until the NEXT trigger
        # commits (ack-after-checkpoint) — the reference's at-least-
        # once ack discipline, not a leak
        assert b.pending_count("corrie.0") == 0
        assert b.pending_count("corrie.1") == 0


@pytest.mark.usefixtures("spark")
def test_commit_log_makes_native_path_replay_safe(spark, tmp_path):
    """K10 upgraded on the native path: with the batch commit log on,
    re-running a drained checkpoint (the crash-after-commit replay
    window) inserts NOTHING twice into ClickHouse — the replayed
    epoch is skipped before the sink runs."""
    broker_root = str(tmp_path / "broker")
    b = FakeAmqpBroker(broker_root)
    for i in range(10):
        b.publish(
            "corrie.0",
            json.dumps({"Query": Q_SQL, "Data": [str(i), "1.0", "t"]}),
        )
    register_amqp_sharded_queue(spark)
    with FakeClickHouseServer() as ch:
        ch.register_table("db.metrics", SCHEMA)

        def drain():
            src = (
                spark.readStream.format("amqp_sharded_queue")
                .option("broker", broker_root)
                .option("queue", "corrie")
                .option("shards", "1")
                .option("stateDir", str(tmp_path / "state"))
                .load()
            )
            q = start_pipeline(
                src,
                NativeTcpSink([f"127.0.0.1:{ch.port}"]),
                DLQSink(str(tmp_path / "dlq")),
                SchemaRegistry({"db.metrics": SCHEMA}),
                PipelineConfig(
                    checkpoint_dir=str(tmp_path / "ckpt"),
                    commit_log_dir=str(tmp_path / "commits"),
                    available_now=True,
                    writer=WriterConfig(retry_interval_s=0.01, max_retries=1),
                ),
            )
            q.awaitTermination(120)

        drain()
        assert sorted(r[0] for r in ch.rows("db.metrics")) == list(range(10))
        drain()  # replay on the same checkpoint + commit log
        assert sorted(r[0] for r in ch.rows("db.metrics")) == list(range(10))
