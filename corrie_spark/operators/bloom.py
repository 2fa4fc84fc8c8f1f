"""Mergeable Bloom filter: broadcast pre-filtering for 100 TB joins.

The classic scale pattern this operator packages: a semi-join of a
huge probe side against a large key set shuffles the probe side on
the key; a Bloom filter of the key set is a few KB–MB of longs that
BROADCASTS, turning the membership test into a map-side projection
over the probe scan — only the (tiny) maybe-member survivors reach
the exact verify join. AQE injects runtime bloom filters for some
shapes; this is the explicit, engine-independent version with a
DETERMINISTIC hash family, so results (including false positives)
are bit-identical across engines and the DuckDB oracle can replay
membership exactly.

Construction is distributed and mergeable:
  - each key contributes k word-updates (word_idx, bit_mask) — a pure
    projection + explode;
  - groupBy(word_idx).agg(bit_or) merges map-side (the partial
    aggregate is the per-partition filter — Bloom OR is the merge
    law), so the exchange carries at most #partitions x (m/64) rows;
  - the m/64 aggregated words collect to the driver (metadata-sized,
    like the k-means centroid set) and re-enter plans as a foldable
    literal array.

Hash family: bit_i(key) = hash60(key, salt='bloom{i}') % m — the same
md5-derived integers everywhere (operators/dedup.hash60), no stored
seeds. False-positive rate follows the standard (1 - e^{-kn/m})^k;
pick m ~ 10 bits/key for ~1% at k=3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corrie_spark.operators.dedup import hash60


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    return [hash60(key, salt=f"bloom{i}") % m_bits for i in range(k_hashes)]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 14, k_hashes: int = 3
) -> list[int]:
    """Build the filter over df[key_col] (strings); returns the m/64
    little-endian words as Python ints — driver-resident metadata to
    feed bloom_member. m_bits must be a multiple of 64."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(key_col).cast("string")
    # call_function: the python shiftleft/shiftright wrappers take a
    # literal int bit count; the SQL functions accept a column
    updates = F.array(
        *[
            F.struct(
                (p / 64).cast("long").alias("w"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                ).alias("mask"),
            )
            for p in _positions(key, m_bits, k_hashes)
        ]
    )
    words = (
        df.select(F.explode(updates).alias("u"))
        .groupBy(F.col("u.w").alias("w"))
        .agg(F.bit_or("u.mask").alias("mask"))
        .collect()
    )  # <= m/64 rows regardless of |df|
    out = [0] * (m_bits // 64)
    for r in words:
        out[int(r["w"])] = int(r["mask"])
    return out


def bloom_member(
    key: Column | str, words: list[int], k_hashes: int = 3
) -> Column:
    """Map-side membership test against a built filter: true iff all
    k bits are set. `words` enters the plan as one foldable literal
    array — zero joins, zero shuffles, runs inside the probe scan's
    projection. No false negatives; false positives at the standard
    Bloom rate (callers follow with an exact verify join over the
    survivors only)."""
    c = F.col(key) if isinstance(key, str) else key
    m_bits = 64 * len(words)
    warr = F.lit([_signed64(w) for w in words]).cast("array<bigint>")
    checks = []
    for p in _positions(c.cast("string"), m_bits, k_hashes):
        word = F.element_at(warr, (p / 64).cast("int") + 1)
        # arithmetic shift + &1 still extracts bit b exactly (sign
        # fill only affects bits above 63-b)
        bit = F.call_function("shiftright", word, (p % 64).cast("int")).bitwiseAND(
            F.lit(1).cast("long")
        )
        checks.append(bit == 1)
    out = checks[0]
    for ch in checks[1:]:
        out = out & ch
    return out


def _signed64(w: int) -> int:
    """Python int (possibly >= 2^63 from bit 63) -> the signed 64-bit
    value Spark's bigint carries for the same bit pattern."""
    w &= (1 << 64) - 1
    return w - (1 << 64) if w >= 1 << 63 else w
