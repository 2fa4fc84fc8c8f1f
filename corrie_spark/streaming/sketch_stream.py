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
