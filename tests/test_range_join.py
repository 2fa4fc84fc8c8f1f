"""bucketed_range_join == naive theta join, on adversarial geometry:
boundary timestamps, intervals spanning multiple bins, overlapping
intervals, and the non-broadcast (shuffle) path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corrie_spark.operators.range_join import bucketed_range_join


def _facts(spark):
    # micros chosen around bin edges for bin_micros=1000
    ts = [0, 999, 1000, 1500, 2999, 3000, 7777, 10_000]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "fid long, us long"
    ).select("fid", F.timestamp_micros(F.col("us")).alias("ts"))


def _intervals(spark):
    # (id, start_us, end_us): misaligned, multi-bin, overlapping, empty
    rows = [
        (0, 500, 1500),      # spans bins 0-1, catches 999,1000
        (1, 1000, 3000),     # exact bin edges, end exclusive (not 3000)
        (2, 0, 10_001),      # spans everything incl. 10_000
        (3, 4000, 5000),     # empty
        (4, 2999, 3001),     # 2-point window across a bin edge
    ]
    return spark.createDataFrame(rows, "iid long, s_us long, e_us long").select(
        "iid",
        F.timestamp_micros(F.col("s_us")).alias("w_start"),
        F.timestamp_micros(F.col("e_us")).alias("w_end"),
    )


def _naive(facts, intervals):
    return facts.join(
        intervals,
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
    ).select("fid", "iid")


@pytest.mark.parametrize("broadcast", [True, False], ids=["broadcast", "shuffle"])
@pytest.mark.parametrize("bin_micros", [1000, 3000, 100_000], ids=["b1k", "b3k", "b100k"])
def test_matches_naive_theta_join(spark, broadcast, bin_micros):
    facts, intervals = _facts(spark), _intervals(spark)
    got = sorted(
        (r.fid, r.iid)
        for r in bucketed_range_join(
            facts, intervals, "ts", "w_start", "w_end", bin_micros,
            broadcast_intervals=broadcast,
        )
        .select("fid", "iid")
        .collect()
    )
    want = sorted((r.fid, r.iid) for r in _naive(facts, intervals).collect())
    assert got == want and len(want) > 0


def test_overlapping_intervals_duplicate_facts(spark):
    facts, intervals = _facts(spark), _intervals(spark)
    out = bucketed_range_join(facts, intervals, "ts", "w_start", "w_end", 1000)
    # fact 2 (ts=1000) is inside intervals 0, 1 and 2 -> three rows
    assert out.filter(F.col("fid") == 2).count() == 3


def test_reversed_and_zero_width_intervals_match_nothing(spark):
    facts = _facts(spark)
    bad = spark.createDataFrame(
        [(0, 5000, 5000), (1, 9000, 1000)], "iid long, s_us long, e_us long"
    ).select(
        "iid",
        F.timestamp_micros(F.col("s_us")).alias("w_start"),
        F.timestamp_micros(F.col("e_us")).alias("w_end"),
    )
    out = bucketed_range_join(facts, bad, "ts", "w_start", "w_end", 1000)
    assert out.count() == 0
