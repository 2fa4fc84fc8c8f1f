"""Continuous-aggregate (rollup-table) store: precompute once, serve
coarser grains forever.

The 100 TB event-analytics pattern (TimescaleDB continuous
aggregates, Druid rollup segments): materialize an HOURLY
pre-aggregation of the raw event stream as a parquet table
partitioned by day, then answer every hour/day/total query from the
rollup — a scan ~|distinct (day, hr, type)| rows instead of |events|
rows. The raw table is only touched when a new grain is added.

Mergeability is the entire contract: each rollup cell stores only
MERGEABLE summaries (count, sum as exact DECIMAL, min, max) so any
coarser grain is a re-aggregation of cells — never a re-scan. Avg is
served as sum/count at read time; non-mergeable forms (raw avg,
median) are deliberately NOT stored. Sums are accumulated as
DECIMAL(18,6) in BOTH passes so the two-level aggregation is
bit-equal to a one-pass aggregation over raw events (float addition
would make rollup-served results order-dependent — the property
tests/test_rollup.py pins).

Partitioning: the rollup writes `day=` hive partitions, so a
day-bounded read prunes at PLANNING time (no footer reads for other
days) and an incremental refresh overwrites exactly the day
partitions a late batch touches (dynamic partition overwrite), never
the whole table.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRAIN_COLS = ["day", "hr", "event_type"]


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The finest stored grain: (day, hr, event_type) cells with
    mergeable summaries. One shuffle, partial-aggregated map-side."""
    return (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").cast("bigint").alias("hr"),
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy(*GRAIN_COLS)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("v").alias("sum_value"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
        )
    )


def write_rollup(events: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize the hourly rollup partitioned by day. Partition
    count = #days — coarse enough that a year is ~365 directories,
    fine enough that late-data refresh rewrites one day."""
    hourly_rollup(events).write.mode(mode).partitionBy("day").parquet(path)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    # hive partition column comes back as the partition's string value
    return df.select(
        F.col("day").cast("string").alias("day"),
        "hr",
        "event_type",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
    )


def _merge(grain: list[str], cells: DataFrame) -> DataFrame:
    """Re-aggregate rollup cells to a coarser grain — the merge law
    per summary: counts/sums add (exact decimal), min of mins, max of
    maxes. Input is |cells| rows, so this runs in milliseconds at any
    raw-data scale."""
    return cells.groupBy(*grain).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def serve_daily(cells: DataFrame) -> DataFrame:
    """(day, event_type) summaries from the rollup, avg derived at
    read time."""
    return (
        _merge(["day", "event_type"], cells)
        .select(
            "day",
            "event_type",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
            # avg over the DOUBLE of the exact decimal sum: decimal
            # division's result scale depends on operand precision
            # (which differs between one- and two-level sums), while
            # double(sum)/count is one IEEE op over identical inputs
            (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
            F.col("min_value").cast("double").alias("min_value"),
            F.col("max_value").cast("double").alias("max_value"),
        )
        .orderBy("day", "event_type")
    )


def serve_total(cells: DataFrame) -> DataFrame:
    """Per-type corpus totals from the rollup."""
    return (
        _merge(["event_type"], cells)
        .select(
            "event_type",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
            F.col("min_value").cast("double").alias("min_value"),
            F.col("max_value").cast("double").alias("max_value"),
        )
        .orderBy("event_type")
    )


def refresh_days(events: DataFrame, path: str, days: list[str]) -> None:
    """Incremental refresh: recompute ONLY the named day partitions
    from the (filtered) raw stream and overwrite them in place.
    Requires spark.sql.sources.partitionOverwriteMode=dynamic on the
    writing session (corrie_spark.session sets it) so untouched days
    survive the overwrite."""
    delta = events.filter(F.date_format("ts", "yyyy-MM-dd").isin(days))
    hourly_rollup(delta).write.mode("overwrite").partitionBy("day").parquet(path)


def merge_into_rollup(spark: SparkSession, events_delta: DataFrame, path: str) -> list[str]:
    """Streaming-increment the rollup: merge a micro-batch of raw
    events into the stored cells. Used from foreachBatch — the
    continuous-aggregate maintenance loop:

      1. aggregate the delta to hourly cells (|delta| -> tiny);
      2. read back ONLY the day partitions the delta touches
         (planning-time pruning — the year's other partitions are
         never opened);
      3. re-merge existing + delta cells (the same merge law as
         serve_*: sums add exactly, min/min, max/max);
      4. dynamic-partition-overwrite exactly those days.

    Exactly-once batches compose with the txn-table discipline
    (sinks/txn_table.py); here the contract is idempotence at the
    DAY level: re-merging the same delta twice WOULD double-count,
    so foreachBatch callers must pair this with the batch-id commit
    log (test_event_streaming shows the pattern). Returns the list
    of day keys rewritten."""
    delta_cells = hourly_rollup(events_delta)
    # touched days: cell-count sized collect (metadata, never events)
    days = [r["day"] for r in delta_cells.select("day").distinct().collect()]
    if not days:
        return []
    try:
        existing = read_rollup(spark, path).filter(F.col("day").isin(days))
        merged_src = existing.unionByName(delta_cells)
    except AnalysisException:
        # first write: no table yet (read.parquet raises PATH_NOT_FOUND
        # eagerly at schema inference). Anything else — permissions,
        # corrupt footers — must propagate, not silently zero history.
        merged_src = delta_cells
    # the write overwrites partitions the plan also READS — cut the
    # lineage first so the writer never streams from files it is
    # replacing (cells are metadata-sized; the checkpoint is cheap)
    merged = _merge(GRAIN_COLS, merged_src).localCheckpoint(eager=True)
    merged.write.mode("overwrite").partitionBy("day").parquet(path)
    return sorted(days)
