"""Bloom filter operator: no false negatives, deterministic false
positives, the OR merge law, and the map-side probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators.bloom import bloom_build, bloom_member
from corrie_spark.queries.registry import all_queries
from tests.conftest import SF_CORRECT


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_no_false_negatives_ever(spark):
    keys = [f"key{i}" for i in range(200)]
    words = bloom_build(_keys_df(spark, keys), "k", m_bits=1 << 10, k_hashes=3)
    probe = _keys_df(spark, keys).select(
        "k", bloom_member(F.col("k"), words, 3).alias("hit")
    )
    assert all(r["hit"] for r in probe.collect())


def test_false_positives_exist_at_high_density_and_are_deterministic(spark):
    """A deliberately-tiny filter (128 bits, 300 keys) must show false
    positives (pigeonhole), and the FP SET is a pure function of the
    md5 family — identical across builds."""
    keys = [f"key{i}" for i in range(300)]
    words = bloom_build(_keys_df(spark, keys), "k", m_bits=128, k_hashes=3)
    others = [f"other{i}" for i in range(300)]
    probe = _keys_df(spark, others).select(
        "k", bloom_member(F.col("k"), words, 3).alias("hit")
    )
    fps = {r["k"] for r in probe.collect() if r["hit"]}
    assert fps  # saturated filter -> false positives certain
    words2 = bloom_build(_keys_df(spark, keys), "k", m_bits=128, k_hashes=3)
    assert words2 == words  # bit-identical build


def test_merge_law_build_of_union_is_or_of_builds(spark):
    """Bloom merge is word-wise OR — the property that makes the
    distributed bit_or aggregate (and cross-snapshot filter reuse)
    correct."""
    a = [f"a{i}" for i in range(80)]
    b = [f"b{i}" for i in range(80)]
    m, k = 1 << 10, 3
    wa = bloom_build(_keys_df(spark, a), "k", m, k)
    wb = bloom_build(_keys_df(spark, b), "k", m, k)
    wu = bloom_build(_keys_df(spark, a + b), "k", m, k)
    mask = (1 << 64) - 1
    assert [(x & mask) | (y & mask) for x, y in zip(wa, wb)] == [w & mask for w in wu]


def test_member_is_map_side_literal(spark):
    """The membership test adds no exchange and no join: it folds the
    filter words into the probe projection."""
    from corrie_spark.plans import count_shuffles
    from corrie_spark.plans.inspect import explain_str

    words = bloom_build(_keys_df(spark, ["x", "y"]), "k", m_bits=1 << 10, k_hashes=3)
    probe = _keys_df(spark, ["x", "z"]).select(
        "k", bloom_member(F.col("k"), words, 3).alias("hit")
    )
    assert count_shuffles(probe) == 0
    assert "Join" not in explain_str(probe)


def test_bloom_prefilter_query_consistency(spark):
    """The registered query's contract: in_corpus implies bloom_hit
    (zero false negatives) on real data."""
    rows = all_queries()["q_bloom_prefilter"](spark, SF_CORRECT).collect()
    assert rows
    assert all(r["bloom_hit"] for r in rows if r["in_corpus"])


def test_m_bits_must_be_word_aligned(spark):
    import pytest

    with pytest.raises(ValueError):
        bloom_build(_keys_df(spark, ["x"]), "k", m_bits=100)
