"""BPE merge trainer: fold semantics (greedy left-to-right,
no re-merge through an emitted token), deterministic winner, and the
round discipline (1-row collects only).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import bpe as B


def _fold(spark, text, a, b):
    from corrie_spark.operators.text import tokens

    df = spark.createDataFrame([(text,)], "text string")
    return df.select(B._merge_fold(tokens("text"), a, b).alias("t")).collect()[0].t


def test_merge_fold_basic(spark):
    assert _fold(spark, "x a b y a b", "a", "b") == ["x", "a b", "y", "a b"]


def test_merge_fold_greedy_no_overlap_remerge(spark):
    # 'a a a' with merge (a,a): left-to-right -> ['a a', 'a'], the
    # emitted merged token must not re-merge with the trailing 'a'
    assert _fold(spark, "a a a", "a", "a") == ["a a", "a"]


def test_merge_fold_edges(spark):
    assert _fold(spark, "", "a", "b") == []
    assert _fold(spark, "solo", "a", "b") == ["solo"]
    assert _fold(spark, "a b", "a", "b") == ["a b"]


def test_train_merges_deterministic_and_sequential(spark):
    rows = [
        (1, "u v u v u v w"),
        (2, "u v q u v"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = B.train_merges(df, n_merges=2)
    # round 1: (u, v) x5 wins; round 2 counts over MERGED tokens
    assert merges[0][1:] == ("u", "v", 5)
    assert merges[1][0] == 2
    # round-2 winner must be a pair over the merged vocabulary
    assert "u v" in (merges[1][1], merges[1][2])


def test_subword_merges_build_words(spark):
    """Frequency-weighted subword BPE reconstructs the dominant word
    greedily: 'hash' x3 drives a->s, as->h, h->ash."""
    df = spark.createDataFrame(
        [(1, "hash hash table hashes")], "doc_id long, text string"
    )
    merges = B.train_subword_merges(df, n_merges=3)
    assert [(a, b) for _r, a, b, _n in merges] == [("a", "s"), ("as", "h"), ("h", "ash")]
    assert [n for *_x, n in merges] == [3, 3, 3]  # 'hashes' contributes too


def test_subword_rounds_are_vocab_sized(spark):
    """The round data is the VOCAB frame: duplicating the corpus 10x
    must not change the learned merges' identity, only the weights."""
    base = [(i, "alpha beta beta") for i in range(1)]
    big = [(i, "alpha beta beta") for i in range(10)]
    m1 = B.train_subword_merges(
        spark.createDataFrame(base, "doc_id long, text string"), n_merges=2
    )
    m10 = B.train_subword_merges(
        spark.createDataFrame(big, "doc_id long, text string"), n_merges=2
    )
    assert [(a, b) for _r, a, b, _n in m1] == [(a, b) for _r, a, b, _n in m10]
    assert [n * 10 for *_x, n in m1] == [n for *_x, n in m10]


def test_apply_merges_order_sensitive(spark):
    """BPE apply must fold merges in rank order — rank-2 ('as','h')
    only fires on rank-1's output."""
    words = spark.createDataFrame([("hash",), ("sash",)], "w string")
    merges = [(1, "a", "s", 3), (2, "as", "h", 3)]
    seg = {r.w: list(r.sym) for r in B.apply_merges(words, merges).collect()}
    assert seg["hash"] == ["h", "ash"]
    assert seg["sash"] == ["s", "ash"]
    # reversed rank order must NOT give the same segmentation
    seg_rev = {
        r.w: list(r.sym)
        for r in B.apply_merges(words, [(1, "as", "h", 3), (2, "a", "s", 3)]).collect()
    }
    assert seg_rev["hash"] == ["h", "as", "h"]
