"""HLL sketch: accuracy envelope and the mergeability contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators.sketch import hll_distinct, hll_estimate, hll_registers


def test_hll_accuracy_at_known_cardinalities(spark):
    """Raw HLL with m=256 has sigma ~ 1.04/sqrt(256) = 6.5%; allow
    3 sigma at n=5000 (no small-range correction, so low cardinality
    is biased — tested separately)."""
    df = spark.range(5000).select(F.lit("k").alias("g"), F.col("id").alias("v"))
    [row] = hll_distinct(df, "g", "v").collect()
    assert abs(row.hll_estimate - 5000) / 5000 < 0.20


def test_hll_merge_equals_single_pass(spark):
    """Register tables merge with MAX — the pre-aggregation property
    that makes the sketch reusable across partitions/days."""
    df = spark.range(2000).select(F.lit("k").alias("g"), F.col("id").alias("v"))
    half1 = df.filter(F.col("v") < 1200)   # overlapping halves
    half2 = df.filter(F.col("v") >= 800)
    merged_regs = (
        hll_registers(half1, "g", "v")
        .unionByName(hll_registers(half2, "g", "v"))
        .groupBy("g", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    [merged] = hll_estimate(merged_regs, "g").collect()
    [single] = hll_distinct(df, "g", "v").collect()
    assert merged.hll_estimate == single.hll_estimate


def test_hll_registers_bounded(spark):
    """State size: at most 256 registers per key regardless of rows."""
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    counts = hll_registers(df, "g", "v").groupBy("g").count().collect()
    assert all(r["count"] <= 256 for r in counts)


def test_cms_merge_law_and_upper_bound(spark):
    """CMS counters built on two disjoint halves sum cell-wise to the
    counters of the union (the merge law that lets sketches pre-
    aggregate per day/partition), and point estimates never
    underestimate the true count."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.sketch import cms_counters, cms_estimate

    rows = [(f"tok{i % 7}",) for i in range(200)] + [("rare",)]
    df = spark.createDataFrame(rows, "t string")
    first = spark.createDataFrame(rows[:100], "t string")
    rest = spark.createDataFrame(rows[100:], "t string")

    whole = cms_counters(df, "t")
    merged = (
        cms_counters(first, "t")
        .unionByName(cms_counters(rest, "t"))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = {(r.row, r.cell): r.cnt for r in whole.collect()}
    m = {(r.row, r.cell): r.cnt for r in merged.collect()}
    assert w == m
    assert sum(w.values()) == 201 * 4

    keys = df.select("t").distinct()
    est = {r.t: r.cms_count for r in cms_estimate(whole, keys, "t").collect()}
    true = {r.t: r.cnt for r in df.groupBy("t").agg(F.count("*").alias("cnt")).collect()}
    for k, n in true.items():
        assert est[k] >= n, (k, est[k], n)


def test_cms_nondefault_geometry_roundtrips(spark):
    """cms_estimate probed with the SAME nondefault depth/width as the
    counters were built with must preserve the upper-bound invariant
    (a geometry mismatch would return zeros)."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.sketch import cms_counters, cms_estimate

    df = spark.createDataFrame([(f"k{i % 5}",) for i in range(100)], "t string")
    counters = cms_counters(df, "t", depth=2, width=64)
    est = {
        r.t: r.cms_count
        for r in cms_estimate(
            counters, df.select("t").distinct(), "t", depth=2, width=64
        ).collect()
    }
    true = {r.t: r.cnt for r in df.groupBy("t").agg(F.count("*").alias("cnt")).collect()}
    for k, n in true.items():
        assert est[k] >= n


def test_cms_weighted_counters_equal_per_occurrence(spark):
    """cms_counters(weight_col=...) over an aggregated (item, count)
    frame must produce the EXACT counter table of the un-aggregated
    per-occurrence stream — the identity the round-14 single-tokenize
    rewrite of q_sketch_cms_heavy_hitters rides."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.sketch import cms_counters

    rows = [(f"k{i % 7}",) for i in range(153)]
    df = spark.createDataFrame(rows, "t string")
    per_occ = {
        (r.row, r.cell): r.cnt for r in cms_counters(df, "t").collect()
    }
    aggd = df.groupBy("t").agg(F.count("*").alias("cnt"))
    weighted = {
        (r.row, r.cell): r.cnt
        for r in cms_counters(aggd, "t", weight_col="cnt").collect()
    }
    assert per_occ == weighted
