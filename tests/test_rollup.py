"""Rollup-table store: rollup-served results must equal raw-scan
results bit-for-bit (the decimal merge law), day partitions must
prune at planning time, and incremental refresh must rewrite only
the touched day.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import rollup as R
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


def _raw_daily(events):
    return (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
            (F.sum("v").cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.min("v").cast("double").alias("min_value"),
            F.max("v").cast("double").alias("max_value"),
        )
        .orderBy("day", "event_type")
    )


def test_rollup_served_equals_raw_scan(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup")
    R.write_rollup(ev, path)
    served = R.serve_daily(R.read_rollup(spark, path)).collect()
    raw = _raw_daily(ev).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in raw]


def test_rollup_total_merge_law(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup2")
    R.write_rollup(ev, path)
    total = {r.event_type: r for r in R.serve_total(R.read_rollup(spark, path)).collect()}
    raw = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert set(total) == set(raw)
    for t in raw:
        assert total[t].n_events == raw[t].n_events
        assert total[t].sum_value == raw[t].sum_value


def test_day_filter_prunes_partitions(spark, tmp_path):
    """A day-bounded read of the rollup must prune to that day's
    partition at planning time (PartitionFilters, zero data filters
    on day)."""
    ev = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup3")
    R.write_rollup(ev, path)
    one_day = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan or "PartitionFilters: [(day" in plan


def test_incremental_refresh_rewrites_only_touched_day(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup4")
    R.write_rollup(ev, path)
    before = {
        (r.day, r.event_type): r for r in R.serve_daily(R.read_rollup(spark, path)).collect()
    }
    days = sorted({d for (d, _t) in before})
    assert len(days) >= 2
    target = days[0]

    # simulate a late-data correction: drop one event type for the day
    corrected = ev.filter(
        ~(
            (F.date_format("ts", "yyyy-MM-dd") == target)
            & (F.col("event_type") == "click")
        )
    )
    R.refresh_days(corrected, path, [target])
    after = {
        (r.day, r.event_type): r for r in R.serve_daily(R.read_rollup(spark, path)).collect()
    }
    # the corrected day changed
    assert (target, "click") in before and (target, "click") not in after
    # every OTHER day's cells survived the dynamic overwrite untouched
    for key, row in before.items():
        if key[0] != target:
            assert tuple(after[key]) == tuple(row)


def test_streaming_merge_equals_batch_rollup(spark, tmp_path):
    """Feeding the events table through merge_into_rollup in three
    arbitrary chunks must converge to the same cells as one batch
    write — the continuous-aggregate maintenance loop is exact."""
    ev = load(spark, SF_SMOKE, "events")
    batch_path = str(tmp_path / "batch")
    inc_path = str(tmp_path / "inc")
    R.write_rollup(ev, batch_path)

    for part in range(3):  # arbitrary, day-straddling chunks
        chunk = ev.filter(F.col("event_id") % 3 == part)
        touched = R.merge_into_rollup(spark, chunk, inc_path)
        assert touched  # every chunk hits at least one day

    a = R.serve_daily(R.read_rollup(spark, batch_path)).collect()
    b = R.serve_daily(R.read_rollup(spark, inc_path)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_streaming_foreachbatch_maintains_rollup(spark, tmp_path):
    """A real Structured Streaming query (file source, availableNow,
    one file per micro-batch) maintaining the rollup store through
    foreachBatch converges to the batch-written cells — the
    continuous-aggregate loop under actual streaming epochs, with
    the batch-id guard that makes a replayed epoch a no-op."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 3, 1, 10, 0), 1, "click", 2.5),
        (2, dt.datetime(2024, 3, 1, 11, 30), 2, "view", 1.0),
        (3, dt.datetime(2024, 3, 2, 9, 15), 1, "click", 4.0),
        (4, dt.datetime(2024, 3, 2, 9, 45), 3, "error", 0.5),
    ]
    ddl = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src_dir = tmp_path / "ev_in"
    df_all = spark.createDataFrame(rows, ddl)
    spark.createDataFrame(rows[:2], ddl).coalesce(1).write.parquet(str(src_dir / "f1"))
    spark.createDataFrame(rows[2:], ddl).coalesce(1).write.parquet(str(src_dir / "f2"))

    store = str(tmp_path / "stream_rollup")
    batch_store = str(tmp_path / "batch_rollup")
    R.write_rollup(df_all, batch_store)

    seen: set[int] = set()

    def per_batch(bdf, batch_id):
        if batch_id in seen:  # replay guard (foreachBatch may retry)
            return
        seen.add(batch_id)
        R.merge_into_rollup(bdf.sparkSession, bdf, store)

    q = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*")
        .writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_rollup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(seen) >= 2  # really ran as multiple micro-batches

    a = R.serve_daily(R.read_rollup(spark, batch_store)).collect()
    b = R.serve_daily(R.read_rollup(spark, store)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
