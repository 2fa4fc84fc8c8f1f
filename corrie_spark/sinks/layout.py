"""Storage layout for scale: time-partitioned and bucketed tables.

The reference appends rows to whatever table the INSERT names; at
100 TB the LAYOUT of those tables decides whether later reads are
possible at all. Two built-in Spark mechanisms cover it:

  - time partitioning (hive-style dirs): a time-range query prunes
    partitions at planning time — scans touch only matching dirs,
    which is the hypertable chunk-exclusion idea;
  - bucketing: pre-hash rows by join key at write time; two tables
    bucketed the same way join with ZERO shuffle of either side,
    forever — amortize one write-time shuffle across every future
    join.

Both are write-path knobs on the standard writer — no custom format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "append",
) -> None:
    """Write parquet partitioned by a derived date column (day) or
    (year, month). Readers filtering on the partition column get
    planning-time pruning (PartitionFilters in the scan, untouched
    dirs never opened)."""
    if granularity == "day":
        out = df.withColumn("p_date", F.to_date(ts_col))
        cols = ["p_date"]
    elif granularity == "month":
        out = df.withColumn("p_year", F.year(ts_col)).withColumn(
            "p_month", F.month(ts_col)
        )
        cols = ["p_year", "p_month"]
    else:
        raise ValueError(f"granularity must be day|month, got {granularity!r}")
    out.write.mode(mode).partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+sorted) table on the join key. A join
    between two tables bucketed identically on that key needs no
    exchange on either side — the write-time shuffle is paid once."""
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
