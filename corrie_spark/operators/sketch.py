"""Distributed sketches with exact cross-engine reproducibility.

HyperLogLog, built Spark-first from Column expressions (no UDF, no
internal Spark HLL++ state): every arithmetic step that could differ
between engines is kept in INTEGERS —

  - register selection / rank: bit ops on a 60-bit md5-prefix hash;
  - register aggregation: MAX of integer ranks per bucket;
  - the harmonic sum: each 2^-M_j term scaled by 2^52 so the sum is
    an exact BIGINT (never an ordered float accumulation);

only the final estimate is one double multiply-divide (IEEE-identical
everywhere). That makes the sketch ORACLE-CHECKABLE: DuckDB computes
the identical estimate from the identical SQL formula — a property
Spark's built-in approx_count_distinct (opaque HLL++ registers)
cannot offer.

Why a sketch at all: COUNT(DISTINCT) at 100 TB shuffles every
distinct key; the HLL register table is m integers per group —
mergeable across partitions/days (MAX per register), the standard
pre-aggregated distinct-count pattern.

Raw HLL estimator only (no small/large-range corrections): the
corrections need ln(), whose last-ulp behavior is libm-specific —
the one step that would break bit-parity. Bias at small cardinality
is visible in tests vs the exact count (both columns emitted).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_BUCKET_BITS = 8
HLL_M = 1 << HLL_BUCKET_BITS  # 256 registers
_VALUE_BITS = 52  # 60-bit hash minus 8 bucket bits
# alpha_m for m=256, written as the expression both engines evaluate.
# e-notation literals: plain decimal literals parse as DECIMAL (with
# engine-specific decimal arithmetic) in BOTH Spark SQL and DuckDB;
# 0.7213e0 parses as DOUBLE in both -> identical IEEE evaluation.
ALPHA_EXPR = f"0.7213e0 / (1.0e0 + 1.079e0 / {HLL_M}.0e0)"


def hll_bucket(h: Column) -> Column:
    """Low 8 bits pick the register."""
    return h.bitwiseAND(F.lit(HLL_M - 1))


def hll_rank(h: Column) -> Column:
    """rho = leading-zero count of the remaining 52-bit value, plus 1;
    capped at 52 (v=0 and v=1 share the cap — deterministic, and keeps
    the scaled harmonic term an exact integer)."""
    v = F.shiftright(h, HLL_BUCKET_BITS)
    chain = F.lit(_VALUE_BITS)
    # build WHEN v >= 2^51 -> 1 ... WHEN v >= 2^1 -> 51 (fold from the
    # smallest threshold so the largest ends up checked first)
    for r in range(_VALUE_BITS - 1, 0, -1):
        chain = F.when(v >= (1 << (_VALUE_BITS - r)), F.lit(r)).otherwise(chain)
    return chain


def hll_rank_sql(h_expr: str) -> str:
    """The identical rank computation as a SQL CASE chain (oracle)."""
    v = f"(({h_expr}) >> {HLL_BUCKET_BITS})"
    whens = " ".join(
        f"WHEN {v} >= {1 << (_VALUE_BITS - r)} THEN {r}"
        for r in range(1, _VALUE_BITS)
    )
    return f"(CASE {whens} ELSE {_VALUE_BITS} END)"


def hll_registers(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Register table: (key, bucket, max rank). Mergeable state — MAX
    again to combine days/partitions; |keys| x 256 rows of three ints.
    """
    from corrie_spark.operators.dedup import hash60

    h = hash60(F.col(value_col).cast("string"))
    return (
        df.select(F.col(key_col), h.alias("h"))
        .select(key_col, hll_bucket(F.col("h")).alias("bucket"), hll_rank(F.col("h")).alias("rank"))
        .groupBy(key_col, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(registers: DataFrame, key_col: str) -> DataFrame:
    """Estimate from the register table. The harmonic sum is exact:
    each register contributes 2^(52 - M_j) as a BIGINT; the 256-hit
    shortfall contributes (m - hit) * 2^52; one double division at
    the end."""
    scaled = registers.withColumn(
        "w", F.expr(f"shiftleft(CAST(1 AS BIGINT), {_VALUE_BITS} - max_rank)")
    )
    return (
        scaled.groupBy(key_col)
        .agg(
            F.sum("w").alias("s_hit"),
            F.count(F.lit(1)).alias("n_hit"),
        )
        .select(
            key_col,
            F.col("n_hit").cast("int").alias("registers_hit"),
            F.expr(
                f"({ALPHA_EXPR}) * {HLL_M * HLL_M}.0e0 * {1 << _VALUE_BITS}.0e0"
                f" / CAST(s_hit + ({HLL_M} - n_hit) * shiftleft(CAST(1 AS BIGINT), {_VALUE_BITS})"
                f" AS DOUBLE)"
            ).alias("hll_estimate"),
        )
    )


def hll_distinct(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key approximate distinct count via the full HLL pipeline."""
    return hll_estimate(hll_registers(df, key_col, value_col), key_col)


# --- Count-Min Sketch + heavy hitters --------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256  # counters per row; error ~ 2N/width with prob 1-2^-depth


def cms_cell(item: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Counter index of `item` in CMS row `row`: md5-derived 60-bit
    hash mod width — reproducible symbolically in DuckDB."""
    from corrie_spark.operators.dedup import hash60

    return hash60(item, salt=f"cms{row}") % width


def cms_counters(
    df: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, cell, cnt) counter table.

    Scale shape: each input row emits `depth` (row, cell) keys — a
    pure map stage — then ONE partial-aggregated shuffle of at most
    depth x width groups (1024 longs by default) regardless of input
    size. Counters are sums, so sketches merge across partitions,
    days, or corpora by adding cell-wise — the pre-aggregation
    pattern that replaces a full groupBy(item) at 100 TB.

    `weight_col`: count each input row as that many occurrences —
    cell(t) = sum of weights of items hashing there, identical to
    feeding the un-aggregated stream (counters are sums), so a caller
    that already holds (item, count) feeds the sketch WITHOUT
    re-exploding per occurrence."""
    item = F.col(item_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("row"),
                cms_cell(item, r, width).alias("cell"),
            )
            for r in range(depth)
        ]
    )
    extra = [F.col(weight_col).alias("_w")] if weight_col else []
    agg = (
        F.sum("_w").cast("long") if weight_col else F.count(F.lit(1))
    )
    return (
        df.select(F.explode(cells).alias("rc"), *extra)
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(agg.alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each key: min over rows of the
    key's counter — never underestimates the true count. The counter
    table (<= depth x width rows) broadcasts; keys never shuffle.
    depth/width MUST match the cms_counters call that built
    `counters` — probing with a different geometry would miss cells
    and return 0s."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        cms_cell(F.col(key_col), r, width).alias("cell"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(key_col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(counters), ["row", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )
