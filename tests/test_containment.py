"""Asymmetric n-gram containment (operators/dedup.ngram_containment):
the sub-document-duplication verifier. The oracle gate
(q_dedup_containment) pins end-to-end values on LSH candidates; these
tests pin the semantics on crafted pairs where containment and
Jaccard disagree."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import dedup as D


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "text_a string, text_b string").select(
        D.ngram_containment(F.col("text_a"), F.col("text_b")).alias("c"),
        D.ngram_jaccard(F.col("text_a"), F.col("text_b")).alias("jaccard"),
    )


def test_embedded_short_doc_scores_high_containment_low_jaccard(spark):
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    [r] = _pairs(spark, [(short, long)]).collect()
    # every shingle of the short doc appears in the long one
    assert r["c"]["cont_a"] == 1.0
    assert r["c"]["cont_b"] < 0.2
    # Jaccard is diluted by the long side's extra grams — the case a
    # Jaccard-only verify under-deduplicates
    assert r["jaccard"] < 0.2


def test_identical_docs_full_containment_both_ways(spark):
    t = "one two three four five"
    [r] = _pairs(spark, [(t, t)]).collect()
    assert r["c"]["cont_a"] == 1.0 and r["c"]["cont_b"] == 1.0
    assert r["jaccard"] == 1.0


def test_disjoint_docs_zero_containment(spark):
    [r] = _pairs(spark, [("a b c d", "x y z w")]).collect()
    assert r["c"]["cont_a"] == 0.0 and r["c"]["cont_b"] == 0.0


def test_containment_matches_python_set_model(spark):
    """Spark containment == |∩|/|A| over distinct word-3-gram sets."""
    rows = [
        ("p q r s t u", "r s t u v w x"),
        ("m n o", "m n o p q"),
        ("a b c d e f g", "c d e f"),
    ]
    def grams(t):
        toks = t.split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    for r, (ta, tb) in zip(_pairs(spark, rows).collect(), rows):
        ga, gb = grams(ta), grams(tb)
        assert r["c"]["cont_a"] == len(ga & gb) / len(ga)
        assert r["c"]["cont_b"] == len(ga & gb) / len(gb)


def test_snapshot_diff_statuses_and_carry(spark):
    """added/removed/changed/unchanged classification and new-first
    carry coalescing (removed rows keep old metadata)."""
    from corrie_spark.operators import dedup as D
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "a", "s1"), (2, "b", "s1"), (3, "c", "s2")],
        "doc_id long, fp string, source string",
    )
    new = spark.createDataFrame(
        [(1, "a", "s1"), (2, "B", "s9"), (4, "d", "s3")],
        "doc_id long, fp string, source string",
    )
    out = {
        r.doc_id: r
        for r in D.snapshot_diff(old, new, carry=("source",)).collect()
    }
    assert out[1].status == "unchanged" and out[1].source == "s1"
    assert out[2].status == "changed" and out[2].source == "s9"  # new wins
    assert out[3].status == "removed" and out[3].source == "s2"  # old kept
    assert out[4].status == "added" and out[4].source == "s3"
