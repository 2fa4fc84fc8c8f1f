"""End-to-end streaming pipeline tests (SURVEY §5 strategy: failure
injection + the F4 invariant: every message lands in exactly one of
(target table, DLQ), never dropped)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from corrie_spark.sinks import DLQSink, ParquetDirSink, SchemaRegistry, WriterConfig
from corrie_spark.sinks.writer import process_batch
from corrie_spark.sources import file_envelope_source
from corrie_spark.streaming import HealthListener, PipelineConfig, start_pipeline

REGISTRY = SchemaRegistry(
    {
        "db.metrics": [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")],
        "db.typed": [("t_id", "Int64"), ("t_flag", "Enum8('a'=1,'b'=2)")],
    }
)


def _envelope(query: str, data: list) -> str:
    return json.dumps({"Query": query, "Data": [None if v is None else str(v) for v in data]})


def _write_stream_file(dir_: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dir_, exist_ok=True)
    with open(os.path.join(dir_, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rows(i: int, query: str, data: list) -> dict:
    return {
        "shard": i % 3,
        "offset": i,
        "body": _envelope(query, data),
        "delivery_id": f"d{i}",
    }


METRICS_Q = "INSERT INTO db.metrics (m_id, m_value, m_tag) VALUES (?, ?, ?)"


def test_pipeline_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    dlq_path = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")

    rows = [_rows(i, METRICS_Q, [i, i * 1.5, f"tag{i % 4}"]) for i in range(50)]
    # poison JSON (M2)
    rows.append({"shard": 0, "offset": 50, "body": "{not json", "delivery_id": "d50"})
    # unknown table (K8)
    rows.append(_rows(51, "INSERT INTO db.nope (x) VALUES (?)", [1]))
    # bad value for Int64 (K7 exec failure)
    rows.append(_rows(52, METRICS_Q, ["not-a-number", 1.0, "t"]))
    _write_stream_file(src, "batch0.json", rows)

    listener = HealthListener()
    spark.streams.addListener(listener)
    try:
        q = start_pipeline(
            file_envelope_source(spark, src),
            ParquetDirSink(out),
            DLQSink(dlq_path),
            REGISTRY,
            PipelineConfig(
                checkpoint_dir=ckpt,
                available_now=True,
                writer=WriterConfig(retry_interval_s=0.01, max_retries=1),
            ),
        )
        q.awaitTermination(120)
    finally:
        spark.streams.removeListener(listener)

    table = spark.read.parquet(os.path.join(out, "db.metrics"))
    assert table.count() == 50
    assert set(table.columns) == {"m_id", "m_value", "m_tag"}
    assert table.agg(F.sum("m_id")).first()[0] == sum(range(50))
    # typed schema survived
    assert dict(table.dtypes)["m_id"] == "bigint"

    dlq = spark.read.schema(DLQSink.SCHEMA).parquet(dlq_path)
    reasons = {r["reason"] for r in dlq.collect()}
    assert dlq.count() == 3
    assert reasons == {"parse_error", "prepare_failed", "exec_failed"}
    # DLQ carries raw original bodies (F4)
    raw = {r["raw_body"] for r in dlq.collect()}
    assert "{not json" in raw
    assert listener.healthy()


def test_pipeline_incremental_and_checkpoint(spark, tmp_path):
    """Second trigger only processes new files (K10 at-least-once via
    checkpoint: no reprocessing of acked input)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    dlq_path = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")

    cfg = PipelineConfig(
        checkpoint_dir=ckpt,
        available_now=True,
        writer=WriterConfig(retry_interval_s=0.01, max_retries=1),
    )
    _write_stream_file(src, "b0.json", [_rows(i, METRICS_Q, [i, 0.5, "a"]) for i in range(10)])
    q = start_pipeline(
        file_envelope_source(spark, src), ParquetDirSink(out), DLQSink(dlq_path), REGISTRY, cfg
    )
    q.awaitTermination(120)
    _write_stream_file(src, "b1.json", [_rows(100 + i, METRICS_Q, [100 + i, 0.5, "b"]) for i in range(5)])
    q = start_pipeline(
        file_envelope_source(spark, src), ParquetDirSink(out), DLQSink(dlq_path), REGISTRY, cfg
    )
    q.awaitTermination(120)

    table = spark.read.parquet(os.path.join(out, "db.metrics"))
    # 10 + 5, no duplicates from replaying b0
    assert table.count() == 15
    assert table.select("m_id").distinct().count() == 15


def test_multi_query_routing(spark, tmp_path):
    """M4: one batch fans out to multiple target tables."""
    out = str(tmp_path / "out")
    dlq_path = str(tmp_path / "dlq")
    bodies = [_rows(i, METRICS_Q, [i, 1.0, "x"]) for i in range(4)] + [
        _rows(10 + i, "INSERT INTO db.typed (t_id, t_flag) VALUES (?, ?)", [i, "a" if i % 2 else "b"])
        for i in range(3)
    ]
    df = spark.createDataFrame(
        [(r["shard"], r["offset"], r["body"], r["delivery_id"]) for r in bodies],
        "shard int, offset long, body string, delivery_id string",
    )
    process_batch(df, ParquetDirSink(out), DLQSink(dlq_path), REGISTRY, WriterConfig(max_retries=0))
    assert spark.read.parquet(os.path.join(out, "db.metrics")).count() == 4
    typed = spark.read.parquet(os.path.join(out, "db.typed"))
    assert typed.count() == 3
    assert {r["t_flag"] for r in typed.collect()} == {"a", "b"}


class FlakySink(ParquetDirSink):
    """Fails the first `n_failures` write calls (transient error, K9)."""

    def __init__(self, base_path: str, n_failures: int):
        super().__init__(base_path)
        self.remaining = n_failures
        self.calls = 0

    def write(self, table, df):
        self.calls += 1
        if self.remaining > 0:
            self.remaining -= 1
            raise RuntimeError("transient sink failure")
        super().write(table, df)


class PoisonSink(ParquetDirSink):
    """Rejects any batch containing a negative m_id (data-dependent
    failure -> must be bisected, K7)."""

    def write(self, table, df):
        if df.filter(F.col("m_id") < 0).limit(1).count() > 0:
            raise RuntimeError("poison row")
        super().write(table, df)


def _metrics_batch(spark, ids):
    rows = [_rows(i, METRICS_Q, [v, 1.0, "x"]) for i, v in enumerate(ids)]
    return spark.createDataFrame(
        [(r["shard"], r["offset"], r["body"], r["delivery_id"]) for r in rows],
        "shard int, offset long, body string, delivery_id string",
    )


def test_retry_transient_failure(spark, tmp_path):
    sink = FlakySink(str(tmp_path / "out"), n_failures=2)
    process_batch(
        _metrics_batch(spark, range(5)),
        sink,
        DLQSink(str(tmp_path / "dlq")),
        REGISTRY,
        WriterConfig(retry_interval_s=0.01, max_retries=3),
    )
    assert spark.read.parquet(str(tmp_path / "out/db.metrics")).count() == 5
    assert sink.calls == 3  # 2 failures + 1 success


def test_bisect_isolates_poison_rows(spark, tmp_path):
    """K7: two poison rows inside a 10-row batch -> 8 land, 2 DLQ."""
    sink = PoisonSink(str(tmp_path / "out"))
    dlq = DLQSink(str(tmp_path / "dlq"))
    ids = [0, 1, 2, -3, 4, 5, 6, -7, 8, 9]
    process_batch(
        _metrics_batch(spark, ids),
        sink,
        dlq,
        REGISTRY,
        WriterConfig(retry_interval_s=0.0, max_retries=0),
    )
    table = spark.read.parquet(str(tmp_path / "out/db.metrics"))
    assert sorted(r["m_id"] for r in table.collect()) == [0, 1, 2, 4, 5, 6, 8, 9]
    dlq_df = spark.read.schema(DLQSink.SCHEMA).parquet(str(tmp_path / "dlq"))
    assert dlq_df.count() == 2
    assert {r["reason"] for r in dlq_df.collect()} == {"exec_failed"}


def test_batch_size_flush_cap_without_shuffle(spark, tmp_path):
    """B1: the flush cap is a file-writer property
    (spark.sql.files.maxRecordsPerFile), NOT a repartition shuffle —
    even a single input partition larger than batch_size lands as
    files of at most batch_size rows, and the session conf is
    restored afterwards."""
    import glob

    prev = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    process_batch(
        _metrics_batch(spark, range(25)).coalesce(1),
        ParquetDirSink(str(tmp_path / "out")),
        DLQSink(str(tmp_path / "dlq")),
        REGISTRY,
        WriterConfig(batch_size=10, max_retries=0),
    )
    files = glob.glob(str(tmp_path / "out/db.metrics/*.parquet"))
    sizes = [spark.read.parquet(f).count() for f in files]
    assert max(sizes) <= 10
    assert sum(sizes) == 25
    assert spark.conf.get("spark.sql.files.maxRecordsPerFile", "0") == prev


def test_constant_driver_jobs_per_group(spark, tmp_path):
    """r1 verdict fix: process_batch runs a CONSTANT number of driver
    jobs plus exactly one distributed append per INSERT shape — the
    marginal cost of an extra shape is 1 job, not 4 re-scans of the
    micro-batch."""

    def jobs_for(n_groups: int) -> int:
        rows = []
        for g in range(n_groups):
            q = f"INSERT INTO db.g{g} (m_id, m_value, m_tag) VALUES (?, ?, ?)"
            rows += [_rows(g * 10 + i, q, [i, 1.0, "x"]) for i in range(5)]
        df = spark.createDataFrame(
            [(r["shard"], r["offset"], r["body"], r["delivery_id"]) for r in rows],
            "shard int, offset long, body string, delivery_id string",
        )
        reg = SchemaRegistry(
            {
                f"db.g{g}": [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")]
                for g in range(n_groups)
            }
        )
        sc = spark.sparkContext
        group = f"job-count-{n_groups}"
        sc.setJobGroup(group, "pin")
        try:
            process_batch(
                df,
                ParquetDirSink(str(tmp_path / f"out{n_groups}")),
                DLQSink(str(tmp_path / f"dlq{n_groups}")),
                reg,
                WriterConfig(max_retries=0),
            )
        finally:
            sc.setJobGroup("", "")
        return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))

    j1, j2, j4 = jobs_for(1), jobs_for(2), jobs_for(4)
    assert j2 - j1 == 1  # one extra shape = exactly one extra append job
    assert j4 - j2 == 2
    # constant overhead: census + validity censuses (AQE may split
    # each into ~2 jobs) + the single append
    assert j1 <= 6


def test_bisection_replay_is_idempotent_with_txn_sink(spark, tmp_path):
    """ADVICE r1: failure-path appends are keyed by chunk CONTENT, so
    a crash replay of an epoch whose group write was bisected does not
    double-append the chunks that already landed."""
    from corrie_spark.sinks.txn_table import TxnSink

    class PoisonTxnSink(TxnSink):
        """Rejects any flush containing a negative m_id."""

        def _check(self, df):
            if df.filter(F.col("m_id") < 0).limit(1).count() > 0:
                raise RuntimeError("poison row")

        def write(self, table, df):
            self._check(df)
            super().write(table, df)

        def write_keyed(self, table, df, content_key):
            self._check(df)
            super().write_keyed(table, df, content_key)

    sink = PoisonTxnSink(str(tmp_path / "wh"))
    dlq = DLQSink(str(tmp_path / "dlq"))
    ids = [0, 1, 2, -3, 4, 5, 6, -7, 8, 9]
    cfg = WriterConfig(retry_interval_s=0.0, max_retries=0, batch_size=4)

    sink.start_epoch(0)
    process_batch(_metrics_batch(spark, ids), sink, dlq, REGISTRY, cfg)
    sink.start_epoch(0)  # crash replay of the same epoch
    process_batch(_metrics_batch(spark, ids), sink, dlq, REGISTRY, cfg)

    table = sink.table("db.metrics").read(spark)
    got = sorted(r["m_id"] for r in table.collect())
    assert got == [0, 1, 2, 4, 5, 6, 8, 9]  # no duplicates, no loss


def test_commit_log_skips_replayed_batch(spark, tmp_path):
    """Effectively-once: a batch replayed after its commit marker
    exists must not append again; an uncommitted batch must."""
    from corrie_spark.sinks.base import BatchCommitLog, DLQSink, ParquetDirSink
    from corrie_spark.sinks.writer import process_batch

    sink = ParquetDirSink(str(tmp_path / "out"))
    dlq = DLQSink(str(tmp_path / "dlq"))
    log_ = BatchCommitLog(str(tmp_path / "commits"))
    batch = _metrics_batch(spark, [1, 2, 3])

    def handle(batch_df, batch_id):
        if log_.committed(batch_id):
            return
        process_batch(batch_df, sink, dlq, REGISTRY)
        log_.commit(batch_id)

    handle(batch, 0)
    handle(batch, 0)  # crash-replay of the same epoch
    assert spark.read.parquet(str(tmp_path / "out" / "db.metrics")).count() == 3
    handle(batch, 1)  # a genuinely new epoch still lands
    assert spark.read.parquet(str(tmp_path / "out" / "db.metrics")).count() == 6
