"""Streaming rate alert: the per-type trailing-window z-score served
from a continuous-aggregate rollup store maintained by Structured
Streaming — the alerting use case is inherently streaming (round-7
verdict #6), and this is its production shape:

  raw event micro-batches
    -> merge_into_rollup          (hourly cells, day-partition rewrite)
    -> rollup store               (|cells| rows, metadata vs the stream)
  serve: cells -> daily counts -> trailing-7-day z-score alert

Replay safety follows the documented merge-law analysis
(streaming/sketch_stream.py): rollup cell counts are SUMS — NOT
idempotent — so the maintenance loop pairs merge_into_rollup with the
batch-id commit log, exactly the recipe the CMS stream documents for
non-idempotent mergeable state. With that pairing, streamed == batch
EXACTLY for any micro-batch split (pinned by
tests/test_sketch_stream.py): per-(day,hr,type) counts are associative
integer sums, and the z-score is a deterministic function of the
daily sums.

100 TB shape: the stream never re-shuffles history — each batch's
delta is |batch cells| rows, the store rewrite touches only the day
partitions the batch landed in, and the alert query reads cells, not
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.operators.rollup import merge_into_rollup, read_rollup
from corrie_spark.sinks.base import BatchCommitLog


def start_rate_alert_stream(
    events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    commit_log_dir: str,
    available_now: bool = True,
):
    """Maintain the rollup store from an event stream. The commit log
    makes the non-idempotent cell merge replay-safe: a redelivered
    batch id is skipped, so at-least-once delivery cannot
    double-count (the same pattern test_event_streaming pins for the
    exact sinks)."""
    commit_log = BatchCommitLog(commit_log_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if commit_log.committed(batch_id):
            return
        merge_into_rollup(batch_df.sparkSession, batch_df, rollup_path)
        commit_log.commit(batch_id)

    writer = (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rate_alert_serve(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The alert, served from rollup cells: daily n = exact-integer
    sum of the day's hourly cell counts (the rollup merge law), then
    the SAME trailing-window z-score the batch query computes — so
    stream-maintained and batch answers are bit-equal."""
    from corrie_spark.queries.window_queries import rate_zscore_from_daily

    daily = (
        read_rollup(spark, rollup_path)
        .groupBy("event_type", "day")
        .agg(F.sum("n_events").cast("bigint").alias("n"))
    )
    return rate_zscore_from_daily(daily)
