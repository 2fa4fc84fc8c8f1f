"""Custom sharded-queue streaming source (DataSourceV2): S1 fan-in,
per-shard FIFO, checkpointed incremental offsets (S4), trigger rate
cap (S2), and end-to-end integration with the envelope pipeline."""

from __future__ import annotations

import json
import os

import pytest

from corrie_spark.sources.sharded_queue import register_sharded_queue

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def queue_dir(tmp_path):
    d = tmp_path / "q"
    for shard in range(3):
        os.makedirs(d / f"shard-{shard}")
    return d


def _spool(queue_dir, shard: int, seq: str, bodies: list[str]) -> None:
    with open(queue_dir / f"shard-{shard}" / f"{seq}.jsonl", "w") as f:
        f.write("\n".join(bodies) + "\n")


def _drain(spark, queue_dir, name, tmp_path, **opts):
    reader = spark.readStream.format("sharded_queue").option("path", str(queue_dir))
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_fan_in_and_per_shard_fifo(spark, tmp_path, queue_dir):
    register_sharded_queue(spark)
    _spool(queue_dir, 0, "000", ["a0", "a1"])
    _spool(queue_dir, 1, "000", ["b0"])
    _spool(queue_dir, 2, "000", ["c0", "c1", "c2"])
    rows = _drain(spark, queue_dir, "sq1", tmp_path)
    assert len(rows) == 6
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.offset)):
        by_shard.setdefault(r.shard, []).append(r.body)
    # fan-in sees every shard; per-shard order = spool order (FIFO)
    assert by_shard == {0: ["a0", "a1"], 1: ["b0"], 2: ["c0", "c1", "c2"]}
    assert {r.delivery_id for r in rows} == {f"{s}-{i}" for s, bs in by_shard.items() for i in range(len(bs))}


def test_checkpoint_resume_reads_only_new(spark, tmp_path, queue_dir):
    """S4: a second run against the same checkpoint must consume only
    lines spooled after the first run (offsets persisted per shard).
    File sink (memory sink can't recover a checkpoint); row counts
    prove no re-read: 2 rows then 2+2, not 2+4."""
    register_sharded_queue(spark)
    out = str(tmp_path / "resume_out")

    def run_once():
        q = (
            spark.readStream.format("sharded_queue")
            .option("path", str(queue_dir))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _spool(queue_dir, 0, "000", ["x0", "x1"])
    run_once()
    assert sorted(r.body for r in spark.read.parquet(out).collect()) == ["x0", "x1"]
    _spool(queue_dir, 0, "001", ["x2"])
    _spool(queue_dir, 1, "000", ["y0"])
    run_once()
    assert sorted(r.body for r in spark.read.parquet(out).collect()) == [
        "x0", "x1", "x2", "y0"
    ]


def test_rate_cap_bounds_micro_batches(spark, tmp_path, queue_dir):
    """S2: maxLinesPerTrigger splits the backlog into multiple
    micro-batches; everything still arrives exactly once."""
    register_sharded_queue(spark)
    _spool(queue_dir, 0, "000", [f"m{i}" for i in range(10)])
    rows = _drain(spark, queue_dir, "sq3", tmp_path, maxLinesPerTrigger=3)
    assert sorted(r.body for r in rows) == sorted(f"m{i}" for i in range(10))
    assert [r.offset for r in sorted(rows, key=lambda r: r.offset)] == list(range(10))


def test_pipeline_over_sharded_queue(spark, tmp_path, queue_dir):
    """The minimum end-to-end slice (SURVEY §7) on the custom source:
    sharded spool -> envelope parse -> typed write + DLQ."""
    from corrie_spark.sinks import DLQSink, ParquetDirSink
    from corrie_spark.sinks.writer import process_batch
    from tests.test_streaming import REGISTRY, _envelope

    register_sharded_queue(spark)
    good = [_envelope("INSERT INTO db.metrics (m_id, m_value, m_tag) VALUES (?, ?, ?)",
                      [i, i * 0.5, "t"]) for i in range(4)]
    _spool(queue_dir, 0, "000", good[:2])
    _spool(queue_dir, 1, "000", good[2:] + ["not json at all"])

    sink = ParquetDirSink(str(tmp_path / "out"))
    dlq = DLQSink(str(tmp_path / "dlq"))
    src = spark.readStream.format("sharded_queue").option("path", str(queue_dir)).load()
    q = (
        src.writeStream.foreachBatch(
            lambda df, _id: process_batch(df, sink, dlq, REGISTRY)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out" / "db.metrics")).count() == 4
    [dead] = spark.read.parquet(str(tmp_path / "dlq")).collect()
    assert dead.raw_body == "not json at all"


def test_offset_probe_incremental(tmp_path):
    """The latestOffset probe is O(new data): files whose byte size is
    unchanged since the last trigger are never re-opened (their line
    count is cached), and read() only opens files overlapping the
    slice — not the consumed prefix."""
    import builtins

    from corrie_spark.sources.sharded_queue import ShardedQueueStreamReader, ShardSlice

    d = tmp_path / "q" / "shard-0"
    os.makedirs(d)
    for seq in range(5):
        with open(d / f"{seq:03d}.jsonl", "w") as f:
            f.write("\n".join(f"m{seq}-{i}" for i in range(100)) + "\n")

    reader = ShardedQueueStreamReader({"path": str(tmp_path / "q")})
    opened: list[str] = []
    real_open = builtins.open

    def counting_open(path, *a, **kw):
        if str(path).endswith(".jsonl"):
            opened.append(os.path.basename(str(path)))
        return real_open(path, *a, **kw)

    builtins.open = counting_open
    try:
        assert reader.latestOffset() == {"0": 500}
        assert len(opened) == 5  # first probe counts everything
        opened.clear()
        assert reader.latestOffset() == {"0": 500}
        assert opened == []  # steady state: zero re-reads
        # append a new file + grow an existing one
        with real_open(d / "005.jsonl", "w") as f:
            f.write("new0\nnew1\n")
        with real_open(d / "004.jsonl", "a") as f:
            f.write("grown\n")
        opened.clear()
        assert reader.latestOffset() == {"0": 503}
        assert sorted(opened) == ["004.jsonl", "005.jsonl"]  # only changed files
        # read() seeks via the planning-time index: consuming the tail
        # slice [499, 503) opens only the files that overlap it
        [part] = reader.partitions({"0": 499}, {"0": 503})
        opened.clear()
        rows = list(reader.read(part))
        assert [r[2] for r in rows] == ["m4-99", "grown", "new0", "new1"]
        assert [r[1] for r in rows] == [499, 500, 501, 502]
        assert sorted(set(opened)) == ["004.jsonl", "005.jsonl"]
    finally:
        builtins.open = real_open


@pytest.mark.usefixtures("spark")
def test_spool_throughput_bench_drains_completely(spark, tmp_path):
    """The executor-parallel spool-source throughput twin (bench.py
    records it next to the driver-side AMQP number) must land every
    envelope and report a positive rate."""
    from corrie_spark.streaming.bench import spool_throughput

    r = spool_throughput(
        spark, n_rows=160, n_shards=4, work_dir=str(tmp_path), warm=False
    )
    assert r["complete"] and r["rows"] == 160 == r["published"]
    assert r["rows_per_s"] > 0
