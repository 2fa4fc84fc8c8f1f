"""Streaming HLL: mergeable sketch state maintained by Structured
Streaming micro-batches, served from an append-only register store.

The streaming twin of the batch rollup-store pattern
(queries/sketch_queries.py `q_sketch_hll_sliding`): each micro-batch
reduces to its |keys| x 256-row register delta (groupBy MAX — partial
agg, map-side combined) and APPENDS it to a parquet register store;
serving merges store rows with one more MAX and applies the estimate
formula. No read-modify-write of state, so:

  - restarts/redeliveries are harmless by ALGEBRA, not machinery:
    register-MAX is idempotent and commutative, so an at-least-once
    append changes nothing — the sketch needs none of the
    txn_table CAS discipline the exact sinks pay for;
  - the store stays small: one delta per (batch, key) is 256 rows of
    three ints regardless of batch size, and a compaction (re-MAX)
    can fold old deltas at any time without a correctness window;
  - batch HLL and streamed HLL agree EXACTLY (pinned by test): max
    of per-batch maxes is the global max, whatever the batch split.

This is the 100 TB shape for "distinct users per key, updated
continuously": the corpus-sized stream never re-shuffles, only
sketch deltas land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.operators.sketch import hll_estimate, hll_registers


def start_hll_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    value_col: str = "user_id",
    available_now: bool = True,
):
    """Start the register-delta stream: each micro-batch appends its
    (key, bucket, max_rank) delta to `out_dir`. Returns the
    StreamingQuery (availableNow by default: drain-and-stop)."""

    def append_delta(batch_df: DataFrame, batch_id: int) -> None:
        (
            hll_registers(batch_df, key_col, value_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        events.writeStream.foreachBatch(append_delta)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hll_serve(
    spark: SparkSession, out_dir: str, key_col: str = "event_type"
) -> DataFrame:
    """Estimate per key from the register store: MAX-merge all deltas
    (the same merge the batch path applies across partitions), then
    the exact-integer harmonic sum. Store size is #batches x #keys x
    256 rows — metadata relative to the stream it summarizes."""
    merged = (
        spark.read.parquet(out_dir)
        .groupBy(key_col, "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    return hll_estimate(merged, key_col)


# --- streaming CMS: the NON-idempotent contrast ---------------------------


def start_cms_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    item_col: str = "event_type",
    available_now: bool = True,
):
    """Start the CMS counter-delta stream. CMS counters are SUMS, so
    unlike the HLL register MAX a redelivered delta WOULD double-count
    — the append-only trick is not enough. Idempotence is restored by
    addressing each delta by its batch id: every micro-batch
    OVERWRITES `out_dir/batch_id=<n>`, so a replayed batch rewrites
    the same partition with the same rows instead of adding to it.
    (This is the general recipe for non-idempotent mergeable state in
    foreachBatch; the HLL path doesn't need it and documents why.)"""
    from corrie_spark.operators.sketch import cms_counters

    def overwrite_delta(batch_df: DataFrame, batch_id: int) -> None:
        (
            cms_counters(batch_df, item_col)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = (
        events.writeStream.foreachBatch(overwrite_delta)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_serve(
    spark: SparkSession, out_dir: str, keys: DataFrame, key_col: str
) -> DataFrame:
    """Point-query the streamed sketch: cell-wise SUM across batch
    deltas (the CMS merge law), then min-over-rows per key."""
    from corrie_spark.operators.sketch import cms_estimate

    merged = (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return cms_estimate(merged, keys, key_col)
