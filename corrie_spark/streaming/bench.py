"""Streaming throughput measurement: the FULL reference pipeline —
file-backed AMQP broker -> sharded streaming source -> envelope
decode/micro-batch writer -> byte-level native-TCP sink into the
in-process ClickHouse-protocol server — drained with one availableNow
trigger and timed wall-to-wall.

This is the number the query bench cannot see: rows/second through
every production layer (source offsets/ack discipline, JSON envelope
parse, typed columnar append, Native-format block encode, socket
write, server decode). Endpoints are the in-process stand-ins the
contract tests use; every layer in between is the production path.

bench.py runs this once per round and records the result next to the
per-query medians in BENCH_FULL.json, so throughput regressions are
diffed round-over-round exactly like query regressions.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession

_SCHEMA = [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")]
_Q_SQL = "INSERT INTO db.metrics (m_id, m_value, m_tag) VALUES (?, ?, ?)"


def _drain(
    spark: SparkSession, tmp: str, n_rows: int, n_shards: int
) -> tuple[float, int]:
    """Seed a fresh broker under `tmp`, drain it through the full pipe
    once (availableNow), return (wall_seconds_of_drain, rows_landed)."""
    from corrie_spark.sinks import DLQSink, SchemaRegistry, WriterConfig
    from corrie_spark.sinks.clickhouse_server import FakeClickHouseServer
    from corrie_spark.sinks.native_tcp import NativeTcpSink
    from corrie_spark.sources.amqp import FakeAmqpBroker, register_amqp_sharded_queue

    from corrie_spark.streaming import PipelineConfig, start_pipeline

    broker_root = os.path.join(tmp, "broker")
    b = FakeAmqpBroker(broker_root)
    per_shard: list[list[str]] = [[] for _ in range(n_shards)]
    for i in range(n_rows):
        per_shard[i % n_shards].append(
            json.dumps({"Query": _Q_SQL, "Data": [str(i), str(i * 0.25), f"t{i % 5}"]})
        )
    for s, bodies in enumerate(per_shard):
        b.publish_many(f"corrie.{s}", bodies)

    register_amqp_sharded_queue(spark)
    with FakeClickHouseServer() as ch:
        ch.register_table("db.metrics", _SCHEMA)
        t0 = time.perf_counter()
        src = (
            spark.readStream.format("amqp_sharded_queue")
            .option("broker", broker_root)
            .option("queue", "corrie")
            .option("shards", str(n_shards))
            # size the S2 prefetch window to the workload: one
            # availableNow trigger consumes one prefetch window per
            # shard, and the bench wants the whole corpus in the
            # measured drain (a deployment tunes this the same way)
            .option("prefetch", str((n_rows + n_shards - 1) // n_shards))
            .option("stateDir", os.path.join(tmp, "state"))
            .load()
        )
        q = start_pipeline(
            src,
            NativeTcpSink([f"127.0.0.1:{ch.port}"]),
            DLQSink(os.path.join(tmp, "dlq")),
            SchemaRegistry({"db.metrics": _SCHEMA}),
            PipelineConfig(
                checkpoint_dir=os.path.join(tmp, "ckpt"),
                available_now=True,
                writer=WriterConfig(retry_interval_s=0.05, max_retries=2),
            ),
        )
        q.awaitTermination(300)
        wall = time.perf_counter() - t0
        landed = len(ch.rows("db.metrics"))
    return wall, landed


def _drain_spool(
    spark: SparkSession, tmp: str, n_rows: int, n_shards: int
) -> tuple[float, int]:
    """Seed a fresh shard-spool under `tmp` and drain it through the
    SAME writer -> native-TCP pipe via the PARTITION-PARALLEL
    DataSourceV2 spool source (one InputPartition per shard, executor-
    side reads) — the scale path, vs _drain's driver-side
    SimpleDataSourceStreamReader (the Spark API for non-seekable
    brokers is driver-bound by design). Both numbers go in
    BENCH_FULL.json (round-7 verdict #2)."""
    from corrie_spark.sinks import DLQSink, SchemaRegistry, WriterConfig
    from corrie_spark.sinks.clickhouse_server import FakeClickHouseServer
    from corrie_spark.sinks.native_tcp import NativeTcpSink
    from corrie_spark.sources.sharded_queue import register_sharded_queue
    from corrie_spark.streaming import PipelineConfig, start_pipeline

    spool = os.path.join(tmp, "spool")
    handles = []
    for s in range(n_shards):
        d = os.path.join(spool, f"shard-{s}")
        os.makedirs(d, exist_ok=True)
        handles.append(open(os.path.join(d, "000000.jsonl"), "w"))
    for i in range(n_rows):
        handles[i % n_shards].write(
            json.dumps({"Query": _Q_SQL, "Data": [str(i), str(i * 0.25), f"t{i % 5}"]})
            + "\n"
        )
    for h in handles:
        h.close()

    register_sharded_queue(spark)
    with FakeClickHouseServer() as ch:
        ch.register_table("db.metrics", _SCHEMA)
        t0 = time.perf_counter()
        src = (
            spark.readStream.format("sharded_queue")
            .option("path", spool)
            .load()
        )
        q = start_pipeline(
            src,
            NativeTcpSink([f"127.0.0.1:{ch.port}"]),
            DLQSink(os.path.join(tmp, "dlq")),
            SchemaRegistry({"db.metrics": _SCHEMA}),
            PipelineConfig(
                checkpoint_dir=os.path.join(tmp, "ckpt"),
                available_now=True,
                writer=WriterConfig(retry_interval_s=0.05, max_retries=2),
            ),
        )
        q.awaitTermination(300)
        wall = time.perf_counter() - t0
        landed = len(ch.rows("db.metrics"))
    return wall, landed


def spool_throughput(
    spark: SparkSession,
    n_rows: int = 64000,
    n_shards: int = 16,
    work_dir: str | None = None,
    warm: bool = True,
    reps: int = 2,
) -> dict:
    """Executor-parallel twin of stream_throughput: drain `n_rows`
    envelopes from an `n_shards`-shard spool through the
    DataSourceV2 source into the same native-TCP sink. Same timed
    window and warm-drain discipline; the delta between this number
    and the AMQP one is exactly the driver-side source bottleneck."""
    tmp = work_dir or tempfile.mkdtemp(prefix="corrie_spool_bench_")
    try:
        if warm:
            _drain_spool(spark, os.path.join(tmp, "warm"), min(100, n_rows), n_shards)
        return _min_of_reps(
            lambda i: _drain_spool(
                spark, os.path.join(tmp, f"main{i}"), n_rows, n_shards
            ),
            n_rows,
            reps,
        )
    finally:
        if work_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)


def _min_of_reps(drain_fn, n_rows: int, reps: int) -> dict:
    """Same timing discipline as the query bench (min-of-reps with the
    full spread on record): a streaming number from ONE rep is at the
    mercy of host noise — the round-8 record showed a phantom -29%
    'regression' on the AMQP path that re-probing attributed entirely
    to single-rep variance (SCALE.md §15)."""
    walls: list[float] = []
    landed = 0
    for i in range(max(1, reps)):
        wall, n = drain_fn(i)
        walls.append(wall)
        landed = n
    best = min(walls)
    return {
        "rows": landed,
        "published": n_rows,
        "wall_seconds": round(best, 3),
        "rows_per_s": round(landed / best, 1) if best > 0 else 0.0,
        "spread_rows_per_s": [
            round(landed / w, 1) for w in sorted(walls, reverse=True)
        ],
        "reps": len(walls),
        "complete": landed == n_rows,
    }


def stream_throughput(
    spark: SparkSession,
    n_rows: int = 4000,
    n_shards: int = 4,
    work_dir: str | None = None,
    warm: bool = True,
    reps: int = 2,
) -> dict:
    """Publish `n_rows` envelopes across `n_shards` broker shards,
    drain them through the full AMQP -> writer -> native-TCP pipe, and
    return {rows, published, wall_seconds, rows_per_s, complete}.

    The timed window covers source read through server-acknowledged
    insert (awaitTermination of the availableNow drain); seeding the
    broker is setup, not throughput. With `warm` (default), a small
    untimed drain runs first so the reported number is steady-state
    pipeline throughput, not the one-off Python-streaming-runner
    spin-up (~8 s) that any long-lived deployment pays once."""
    tmp = work_dir or tempfile.mkdtemp(prefix="corrie_stream_bench_")
    try:
        if warm:
            _drain(spark, os.path.join(tmp, "warm"), min(100, n_rows), n_shards)
        return _min_of_reps(
            lambda i: _drain(spark, os.path.join(tmp, f"main{i}"), n_rows, n_shards),
            n_rows,
            reps,
        )
    finally:
        if work_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)
