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


def morton_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """2-D Z-order (Morton) key: interleave the low `bits` bits of two
    non-negative integer columns — bit i of c1 lands at position 2i,
    of c2 at 2i+1. Pure integer expressions (shiftleft/and/or), so the
    key is engine-reproducible and costs one projection.

    Inputs must already be quantized to [0, 2^bits): callers rank or
    bucket raw values first (e.g. ntile, epoch-minutes, price cents).
    """
    k = F.lit(0).cast("bigint")
    for i in range(bits):
        k = (
            k
            .bitwiseOR(F.shiftleft(c1.bitwiseAND(F.lit(1 << i)).cast("bigint"), i))
            .bitwiseOR(F.shiftleft(c2.bitwiseAND(F.lit(1 << i)).cast("bigint"), i + 1))
        )
    return k


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the 2-D Z-order of (c1, c2): rows
    are range-partitioned and sorted by the Morton key, so every
    file/row-group covers a small RECTANGLE of the (c1, c2) plane and
    its parquet min/max stats are tight on BOTH columns — point/range
    filters on EITHER column skip most row groups. A plain sort by c1
    gives tight stats on c1 only; c2's min/max spans the full domain
    in every group and no c2 filter can skip anything
    (tests/test_layout.py proves the difference from the footers).

    This is the multi-dimensional analogue of write_time_partitioned:
    partitioning prunes on one axis at planning time, Z-order prunes
    on two axes at scan time from row-group stats."""
    keyed = df.withColumn("_z", morton_key(F.col(c1), F.col(c2), bits))
    keyed.repartitionByRange(files, "_z").sortWithinPartitions("_z").drop(
        "_z"
    ).write.mode(mode).parquet(path)
