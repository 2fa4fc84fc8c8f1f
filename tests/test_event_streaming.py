"""Event-time streaming: stream/batch unification, watermarked dedup,
and the count-trigger stateful batcher (B1 parity).

All tests drive real StreamingQueries over file sources with
availableNow/maxFilesPerTrigger to force multi-micro-batch execution,
then assert against the batch form of the same operator — the
unification contract is the correctness oracle here.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from corrie_spark.streaming.events import (
    count_trigger_batches,
    dedup_within_watermark,
    windowed_event_counts,
)

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, EVENTS_DDL)


def _ev(i, minute, etype="click", user=1, value=1.0):
    return (i, dt.datetime(2021, 3, 1, 10 + minute // 60, minute % 60, 0), user, etype, value)


@pytest.fixture()
def event_files(spark, tmp_path):
    """Two parquet files -> two micro-batches under maxFilesPerTrigger=1."""
    d = tmp_path / "events_in"
    batch1 = [_ev(1, 0), _ev(2, 5, "view"), _ev(3, 20), _ev(4, 31)]
    batch2 = [_ev(5, 40), _ev(6, 47, "view"), _ev(7, 62), _ev(8, 75)]
    _mk_events(spark, batch1).coalesce(1).write.parquet(str(d / "f1"))
    _mk_events(spark, batch2).coalesce(1).write.parquet(str(d / "f2"))
    return d, batch1 + batch2


def _stream(spark, path):
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/*")
    )


def _run_to_memory(df, name, tmp_path, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_stream_equals_batch(spark, tmp_path, event_files):
    d, rows = event_files
    stream_out = windowed_event_counts(_stream(spark, d))
    _run_to_memory(stream_out, "win_stream", tmp_path, "complete")
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_stream").collect()
    }
    batch_out = windowed_event_counts(_mk_events(spark, rows), watermark=None)
    want = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in batch_out.collect()
    }
    assert got == want and len(want) > 2


def test_dedup_within_watermark_drops_redelivery(spark, tmp_path):
    """At-least-once redelivery (same event_id in a later batch) is
    dropped while the key is inside the watermark horizon."""
    d = tmp_path / "dup_in"
    batch1 = [_ev(1, 0), _ev(2, 5)]
    batch2 = [_ev(1, 0), _ev(2, 5), _ev(3, 10)]  # 1, 2 redelivered
    _mk_events(spark, batch1).coalesce(1).write.parquet(str(d / "f1"))
    _mk_events(spark, batch2).coalesce(1).write.parquet(str(d / "f2"))
    deduped = dedup_within_watermark(_stream(spark, d))
    _run_to_memory(deduped, "dedup_stream", tmp_path, "append")
    ids = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_stream").collect())
    assert ids == [1, 2, 3]


def test_count_trigger_batcher_flushes_on_threshold(spark, tmp_path):
    """B1 parity: a query-group flushes the moment it reaches
    batch_size rows — including a flush assembled from rows BUFFERED
    ACROSS micro-batches (7 rows then 3 rows, batch_size 5 -> two
    full count-flushes)."""
    d = tmp_path / "env_in"
    q1 = "INSERT INTO metrics VALUES (?)"
    rows1 = [(q1, f"r{i}") for i in range(7)]
    rows2 = [(q1, f"r{i}") for i in range(7, 10)]
    spark.createDataFrame(rows1, "query string, data string").coalesce(1).write.parquet(
        str(d / "f1")
    )
    spark.createDataFrame(rows2, "query string, data string").coalesce(1).write.parquet(
        str(d / "f2")
    )
    env = (
        spark.readStream.schema("query string, data string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    batched = count_trigger_batches(env, batch_size=5, period_ms=60_000)
    _run_to_memory(batched, "batcher", tmp_path, "append")
    out = spark.sql("SELECT * FROM batcher").collect()
    flushes = {}
    for r in out:
        flushes.setdefault(r.batch_seq, []).append(r)
    # two complete count-flushes of exactly 5 rows each
    assert sorted(flushes) == [0, 1]
    for seq, rs in flushes.items():
        assert len(rs) == 5
        assert {r.flush_reason for r in rs} == {"count"}
        assert all(r.batch_size == 5 for r in rs)
    # every emitted row belongs to the one query group
    assert {r.query for r in out} == {q1}
    # 10 rows in, two flushes of 5 out -> nothing lost, nothing extra
    assert len(out) == 10


def test_windowed_append_mode_emits_closed_windows(spark, tmp_path, event_files):
    """Append mode + watermark: only windows sealed by the final
    watermark are emitted — the bounded-state contract. The emitted
    set must be a prefix (by window start) of the batch result."""
    d, rows = event_files
    stream_out = windowed_event_counts(_stream(spark, d), watermark="10 minutes")
    _run_to_memory(stream_out, "win_append", tmp_path, "append")
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_append").collect()
    }
    batch_out = windowed_event_counts(_mk_events(spark, rows), watermark=None)
    want = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in batch_out.collect()
    }
    assert got.issubset(want)
    emitted_starts = {g[0] for g in got}
    unemitted_starts = {w[0] for w in want} - emitted_starts
    assert all(u > max(emitted_starts) for u in unemitted_starts) or not emitted_starts


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream join with watermarks on both sides: events match
    orders of the same user placed at most 30 min earlier. The
    streamed result (multi-micro-batch) must equal the batch range
    join on the same data."""
    from corrie_spark.streaming.events import stream_interval_join

    ORDERS_DDL = "o_orderkey long, o_ts timestamp, user_id long"

    def _o(k, minute, user=1):
        return (k, dt.datetime(2021, 3, 1, 10 + minute // 60, minute % 60, 0), user)

    d_ev = tmp_path / "ev_in"
    d_or = tmp_path / "or_in"
    ev1 = [_ev(1, 10), _ev(2, 40)]
    ev2 = [_ev(3, 70), _ev(4, 95, user=2)]
    or1 = [_o(100, 0), _o(101, 35)]
    or2 = [_o(102, 80), _o(103, 90, user=2)]
    _mk_events(spark, ev1).coalesce(1).write.parquet(str(d_ev / "f1"))
    _mk_events(spark, ev2).coalesce(1).write.parquet(str(d_ev / "f2"))
    spark.createDataFrame(or1, ORDERS_DDL).coalesce(1).write.parquet(str(d_or / "f1"))
    spark.createDataFrame(or2, ORDERS_DDL).coalesce(1).write.parquet(str(d_or / "f2"))

    ev_stream = _stream(spark, d_ev)
    or_stream = (
        spark.readStream.schema(ORDERS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d_or}/*")
    )
    joined = stream_interval_join(
        ev_stream, or_stream, on="user_id", left_ts="ts", right_ts="o_ts"
    ).select("event_id", "user_id", "o_orderkey")
    _run_to_memory(joined, "ss_join", tmp_path, "append")
    got = {
        (r.event_id, r.user_id, r.o_orderkey)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    ev_batch = _mk_events(spark, ev1 + ev2)
    or_batch = spark.createDataFrame(or1 + or2, ORDERS_DDL)
    want = {
        (r.event_id, r.user_id, r.o_orderkey)
        for r in stream_interval_join(
            ev_batch, or_batch, on="user_id", left_ts="ts", right_ts="o_ts"
        )
        .select("event_id", "user_id", "o_orderkey")
        .collect()
    }
    assert got == want and len(want) >= 3


def test_late_data_beyond_watermark_dropped(spark, tmp_path):
    """An event arriving after its window's state was EVICTED must be
    dropped (bounded-state contract). Nuance pinned here: a late row
    that lands while the window state is still live is merged —
    Spark's guarantee is drop-after-eviction, not drop-at-watermark.
    So the watermark advances in batch 2, the window is emitted and
    evicted during batch 3, and the late row arrives in batch 4."""
    d = tmp_path / "late_in"
    _mk_events(spark, [_ev(1, 0), _ev(2, 5)]).coalesce(1).write.parquet(str(d / "f1"))
    # watermark after this batch: 12:00 - 10 min = 11:50 > window end
    _mk_events(spark, [_ev(3, 120)]).coalesce(1).write.parquet(str(d / "f2"))
    # this batch runs with watermark 11:50 -> [10:00,10:15) emits + evicts
    _mk_events(spark, [_ev(5, 125)]).coalesce(1).write.parquet(str(d / "f3"))
    # state gone: the late row for the sealed window must be dropped
    _mk_events(spark, [_ev(4, 2)]).coalesce(1).write.parquet(str(d / "f4"))

    out = windowed_event_counts(_stream(spark, d), watermark="10 minutes")
    _run_to_memory(out, "late_win", tmp_path, "append")
    got = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.sql("SELECT * FROM late_win").collect()
    }
    assert ("2021-03-01T10:00:00", 2) in got, got
    # the late event re-opened nothing: no other window covers 10:02
    assert not any(ws == "2021-03-01T10:00:00" and n != 2 for ws, n in got)


def test_transform_with_state_migration_tripwire():
    """Decision record (r1 verdict #10): the count-trigger batcher
    stays on applyInPandasWithState because transformWithStateInPandas
    cannot initialize here — its python runner needs google.protobuf,
    which is absent and uninstallable in this environment (probed:
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, ImportError
    'descriptor' from google.protobuf). If protobuf ever appears,
    this test fails to force the migration to be revisited."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        blocked = False
    except ImportError:
        blocked = True
    assert blocked, (
        "google.protobuf is now importable: revisit the "
        "transformWithStateInPandas migration for count_trigger_batches "
        "(corrie_spark/streaming/events.py)"
    )


def test_streaming_hll_registers_merge_across_microbatches(spark, tmp_path, event_files):
    """Sketches compose with streaming: per-micro-batch HLL register
    tables (what foreachBatch would persist per epoch) merged by MAX
    per bucket are BIT-IDENTICAL to sketching the whole stream in one
    batch — so a streaming rollup can serve distinct-count estimates
    without ever reprocessing history."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.sketch import hll_estimate, hll_registers

    d, rows = event_files
    epochs = []

    def per_batch(df, epoch_id):
        epochs.append(hll_registers(df, "event_type", "user_id").collect())

    q = (
        _stream(spark, d)
        .writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(epochs) >= 2  # maxFilesPerTrigger=1 -> one epoch per file

    merged_rows = [r for ep in epochs for r in ep]
    merged = (
        spark.createDataFrame(merged_rows)
        .groupBy("event_type", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    got = {
        (r.event_type, round(r.hll_estimate, 9))
        for r in hll_estimate(merged, "event_type").collect()
    }
    whole = hll_registers(_mk_events(spark, rows), "event_type", "user_id")
    want = {
        (r.event_type, round(r.hll_estimate, 9))
        for r in hll_estimate(whole, "event_type").collect()
    }
    assert got == want and len(want) >= 2
