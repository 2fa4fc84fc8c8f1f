"""Streaming HLL (corrie_spark/streaming/sketch_stream.py): the
mergeable-sketch streaming pattern. Exactness contract: streamed
estimate == batch estimate for ANY micro-batch split, and redelivered
deltas change nothing (register MAX is idempotent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators.sketch import hll_distinct
from corrie_spark.streaming.sketch_stream import hll_serve, start_hll_stream
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


def _estimates(df):
    return {
        r["event_type"]: (r["registers_hit"], r["hll_estimate"])
        for r in df.collect()
    }


def test_streamed_hll_equals_batch_hll(spark, tmp_path):
    events = load(spark, SF_SMOKE, "events").select("event_type", "user_id")
    # split into many files so availableNow produces multiple batches
    src = str(tmp_path / "src")
    events.repartition(7).write.parquet(src)
    stream = (
        spark.readStream.schema("event_type string, user_id bigint")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "regs"), str(tmp_path / "ckpt")
    q = start_hll_stream(stream, out, ckpt)
    q.awaitTermination(120)
    got = _estimates(hll_serve(spark, out))
    want = _estimates(hll_distinct(events, "event_type", "user_id"))
    assert got == want  # exact, not approximate, agreement


def test_redelivered_delta_is_a_noop(spark, tmp_path):
    """At-least-once appends are harmless by algebra: duplicating
    every stored delta leaves the served estimate unchanged."""
    events = load(spark, SF_SMOKE, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema("event_type string, user_id bigint").parquet(src)
    out, ckpt = str(tmp_path / "regs"), str(tmp_path / "ckpt")
    q = start_hll_stream(stream, out, ckpt)
    q.awaitTermination(120)
    before = _estimates(hll_serve(spark, out))
    spark.read.parquet(out).write.mode("append").parquet(out)  # redeliver all
    assert _estimates(hll_serve(spark, out)) == before


def test_store_is_sketch_sized(spark, tmp_path):
    """Each batch's delta is bounded by #keys x 256 rows no matter how
    many events the batch carried."""
    events = load(spark, SF_SMOKE, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema("event_type string, user_id bigint").parquet(src)
    out, ckpt = str(tmp_path / "regs"), str(tmp_path / "ckpt")
    q = start_hll_stream(stream, out, ckpt)
    q.awaitTermination(120)
    store = spark.read.parquet(out)
    n_keys = events.select("event_type").distinct().count()
    n_batches = store.select("batch_id").distinct().count()
    assert store.count() <= n_keys * 256 * n_batches


def test_streamed_cms_equals_batch_cms(spark, tmp_path):
    """Cell-wise SUM of per-batch CMS deltas == the one-shot batch
    sketch, for any micro-batch split (counter addition is the CMS
    merge law)."""
    from corrie_spark.operators.sketch import cms_counters, cms_estimate
    from corrie_spark.streaming.sketch_stream import cms_serve, start_cms_stream

    events = load(spark, SF_SMOKE, "events").select("event_type")
    src = str(tmp_path / "src")
    events.repartition(5).write.parquet(src)
    stream = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "cms"), str(tmp_path / "ckpt")
    q = start_cms_stream(stream, out, ckpt)
    q.awaitTermination(120)
    keys = events.distinct()
    got = {
        r["event_type"]: r["cms_count"]
        for r in cms_serve(spark, out, keys, "event_type").collect()
    }
    want = {
        r["event_type"]: r["cms_count"]
        for r in cms_estimate(
            cms_counters(events, "event_type"), keys, "event_type"
        ).collect()
    }
    assert got == want


def test_replayed_cms_batch_is_idempotent(spark, tmp_path):
    """Re-writing a batch's delta partition (the foreachBatch replay
    case) leaves the served counts unchanged — overwrite-by-batch-id
    is what makes the SUM-merged sketch safe under at-least-once."""
    from corrie_spark.operators.sketch import cms_counters
    from corrie_spark.streaming.sketch_stream import cms_serve, start_cms_stream

    events = load(spark, SF_SMOKE, "events").select("event_type")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema("event_type string").parquet(src)
    out, ckpt = str(tmp_path / "cms"), str(tmp_path / "ckpt")
    q = start_cms_stream(stream, out, ckpt)
    q.awaitTermination(120)
    keys = events.distinct()
    before = {
        r["event_type"]: r["cms_count"]
        for r in cms_serve(spark, out, keys, "event_type").collect()
    }
    # replay batch 0: same data, same partition, overwrite
    cms_counters(events, "event_type").write.mode("overwrite").parquet(
        f"{out}/batch_id=0"
    )
    after = {
        r["event_type"]: r["cms_count"]
        for r in cms_serve(spark, out, keys, "event_type").collect()
    }
    assert after == before


def test_hll_store_compaction_preserves_estimates(spark, tmp_path):
    """The docstring's compaction claim, pinned: folding all deltas
    into one MAX-merged generation (what a janitor job would do to
    bound store growth) leaves served estimates identical."""
    from pyspark.sql import functions as F

    events = load(spark, SF_SMOKE, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    events.repartition(6).write.parquet(src)
    stream = (
        spark.readStream.schema("event_type string, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "regs"), str(tmp_path / "ckpt")
    q = start_hll_stream(stream, out, ckpt)
    q.awaitTermination(120)
    before = _estimates(hll_serve(spark, out))
    compacted = (
        spark.read.parquet(out)
        .groupBy("event_type", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
        .withColumn("batch_id", F.lit(-1).cast("long"))
    )
    tmp_out = str(tmp_path / "regs_compacted")
    compacted.write.parquet(tmp_out)
    assert _estimates(hll_serve(spark, tmp_out)) == before
    # and the compacted store is one generation: <= keys x 256 rows
    n_keys = events.select("event_type").distinct().count()
    assert spark.read.parquet(tmp_out).count() <= n_keys * 256


# --- streaming rate alert from the rollup store (round-7 #6) ---------------


def _alert_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_rate_alert_equals_batch(spark, tmp_path):
    """The z-score alert served from the stream-maintained rollup
    store must equal the batch query bit-for-bit, for any micro-batch
    split (cell counts are associative integer sums; the z-score is a
    deterministic function of the daily sums)."""
    from corrie_spark.queries.registry import all_queries
    from corrie_spark.streaming.rate_alert import (
        rate_alert_serve,
        start_rate_alert_stream,
    )

    events = load(spark, SF_SMOKE, "events").select(
        "ts", "event_type", F.col("value").cast("double").alias("value")
    )
    src = str(tmp_path / "src")
    events.repartition(7).write.parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    rollup = str(tmp_path / "rollup")
    q = start_rate_alert_stream(
        stream, rollup, str(tmp_path / "ckpt"), str(tmp_path / "commits")
    )
    q.awaitTermination(120)

    got = _alert_rows(rate_alert_serve(spark, rollup))
    want = _alert_rows(all_queries()["q_events_rate_zscore"](spark, SF_SMOKE))
    assert got == want


def test_rate_alert_replay_is_skipped(spark, tmp_path):
    """Rollup cell merge is a SUM (not idempotent), so the maintenance
    loop's commit log must make a replayed batch a no-op: restarting
    the stream over the same source with a fresh checkpoint (batch
    ids restart at 0) leaves the served alert unchanged."""
    from corrie_spark.streaming.rate_alert import (
        rate_alert_serve,
        start_rate_alert_stream,
    )

    events = load(spark, SF_SMOKE, "events").select(
        "ts", "event_type", F.col("value").cast("double").alias("value")
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    def run(ckpt):
        stream = spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).parquet(src)
        q = start_rate_alert_stream(
            stream, str(tmp_path / "rollup"), str(tmp_path / ckpt),
            str(tmp_path / "commits"),
        )
        q.awaitTermination(120)

    run("ckpt1")
    before = _alert_rows(rate_alert_serve(spark, str(tmp_path / "rollup")))
    run("ckpt2")  # replay: same batches, fresh checkpoint, same commit log
    after = _alert_rows(rate_alert_serve(spark, str(tmp_path / "rollup")))
    assert after == before
