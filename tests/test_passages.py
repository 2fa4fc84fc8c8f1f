"""Duplicated-passage operator: span-merge math and scale shape.

Hand-computed fixtures pin the interval-union semantics (two grams at
positions p < q merge iff q <= p + n); the plan test pins that the
per-doc span stage adds no Python and the occurrence rows shuffled
carry no gram strings.
"""

from __future__ import annotations

import pytest

from corrie_spark.operators import passages as P


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_occurrences_positions(spark):
    # 5 tokens, n=3 -> grams at pos 1..3
    df = _docs(spark, [(1, "a b c d e")])
    occ = P.ngram_occurrences(df, n=3, keep_gram=True).orderBy("pos").collect()
    assert [(r.pos, r.gram) for r in occ] == [(1, "a b c"), (2, "b c d"), (3, "c d e")]


def test_short_and_empty_docs_emit_nothing(spark):
    df = _docs(spark, [(1, "a b"), (2, ""), (3, "   ")])
    assert P.ngram_occurrences(df, n=3).count() == 0


def test_duplicated_grams_two_stage_distinct(spark):
    # gram "x y z" in docs 1,2 (doc 1 twice); "p q r" only in doc 3
    df = _docs(
        spark,
        [
            (1, "x y z k x y z"),
            (2, "h x y z w"),
            (3, "p q r s"),
        ],
    )
    occ = P.ngram_occurrences(df, n=3, keep_gram=True)
    dup = P.duplicated_grams(occ, min_docs=2, gram_col="gram").collect()
    assert len(dup) == 1
    assert dup[0].gram == "x y z" and dup[0].n_docs == 2 and dup[0].n_occ == 3


@pytest.mark.parametrize(
    "text_a,text_b,expect",
    [
        # one shared 3-gram -> 1 span covering 3 tokens
        ("a b c q w e r t", "z z a b c z q q", (1, 1, 3)),
        # overlapping dup grams (positions 1,2) -> merged single span of 4
        ("a b c d x1 y1 z1", "a b c d x2 y2 z2", (2, 1, 4)),
        # far-apart dup grams -> two spans, coverage 3+3
        ("a b c m1 m2 m3 m4 m5 a b c", "a b c n1 n2 n3 n4 n5 a b c", (2, 2, 6)),
    ],
)
def test_span_merge_semantics(spark, text_a, text_b, expect):
    df = _docs(spark, [(1, text_a), (2, text_b)])
    row = (
        P.dup_passage_stats(df, n=3, min_docs=2)
        .filter("doc_id = 1")
        .collect()[0]
    )
    n_dup, n_spans, covered = expect
    assert (row.n_dup_grams, row.n_spans, row.covered_tokens) == (n_dup, n_spans, covered)
    assert row.dup_frac == covered / row.n_tokens


def test_touching_spans_merge_exactly_at_gap_n(spark):
    # positions 1 and 4 with n=3: q = p + n -> intervals [1,3],[4,6]
    # touch -> ONE span, coverage 6. Shared grams "a b c" and "d e f".
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c x d e f")])
    row = P.dup_passage_stats(df, n=3, min_docs=2).filter("doc_id = 1").collect()[0]
    assert (row.n_spans, row.covered_tokens) == (1, 6)


def test_default_stats_shuffle_no_strings(spark):
    """Scale shape: the per-doc stats path must not carry gram
    strings through any exchange — occurrence rows are (doc_id, pos,
    gram_hash) longs only, and the hash is computed map-side."""
    df = _docs(spark, [(1, "a b c d e f g h i j")])
    occ = P.ngram_occurrences(df, n=3)
    # default occurrence frame exposes no string gram column at all
    assert occ.schema.fieldNames() == ["doc_id", "pos", "gram_hash"]
    plan = P.dup_passage_stats(df, n=3)._jdf.queryExecution().executedPlan().toString()
    # every shuffle is keyed on longs (gram_hash / doc_id), never gram
    for m in __import__("re").finditer(r"Exchange \w+partitioning\(([^)#]+)#", plan):
        assert m.group(1).strip() in ("gram_hash", "doc_id"), plan


def test_sf_smoke_matches_known_counts(spark):
    """sf0.01 ground truth (DuckDB-derived, pinned): 47 docs carry a
    duplicated 8-gram."""
    from corrie_spark.tables import load
    from tests.conftest import SF_CORRECT

    docs = load(spark, SF_CORRECT, "documents")
    assert P.dup_passage_stats(docs, n=8, min_docs=2).count() == 47


def test_strip_removes_exactly_covered_tokens(spark):
    df = _docs(spark, [(1, "a b c d e x y z"), (2, "q w a b c d r t"), (3, "u v w")])
    out = {r.doc_id: r for r in P.strip_duplicated_passages(df, n=3, min_docs=2).collect()}
    # docs 1,2 share grams "a b c"/"b c d" -> covered tokens a b c d
    assert out[1].n_removed == 4
    assert out[1].clean_text == "e x y z"
    assert out[2].n_removed == 4
    assert out[2].clean_text == "q w r t"
    # untouched doc passes through verbatim with n_removed = 0
    assert out[3].n_removed == 0 and out[3].clean_text == "u v w"
    # conservation: kept + removed == total
    for r in out.values():
        assert r.n_tokens - r.n_removed == len(r.clean_text.split()) if r.clean_text else r.n_tokens == r.n_removed


def test_strip_fully_covered_doc_yields_empty_text(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    out = {r.doc_id: r for r in P.strip_duplicated_passages(df, n=3, min_docs=2).collect()}
    assert out[1].n_removed == 3 and out[1].clean_text == ""


# --- property: operator vs brute-force Python reference --------------------

def _ref_passage_stats(texts: dict[int, str], n: int, min_docs: int = 2):
    """Row-at-a-time reference implementation of dup_passage_stats."""
    occ: dict[int, list[tuple[int, str]]] = {}
    gram_docs: dict[str, set[int]] = {}
    for did, text in texts.items():
        toks = text.split()
        grams = [
            (i + 1, " ".join(toks[i : i + n])) for i in range(len(toks) - n + 1)
        ]
        occ[did] = grams
        for _pos, g in grams:
            gram_docs.setdefault(g, set()).add(did)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = {}
    for did, grams in occ.items():
        ps = sorted(p for p, g in grams if g in dup)
        if not ps:
            continue
        covered = set()
        for p in ps:
            covered.update(range(p, p + n))
        n_spans = 1 + sum(1 for a, b in zip(ps, ps[1:]) if b - a > n)
        out[did] = (len(ps), n_spans, len(covered))
    return out


def test_property_operator_matches_reference(spark):
    """Randomized docs (seeded): the distributed operator must agree
    with the brute-force reference on every doc's (n_dup_grams,
    n_spans, covered_tokens)."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    texts = {}
    for did in range(40):
        k = rng.randint(0, 30)
        toks = [rng.choice(vocab) for _ in range(k)]
        texts[did] = " ".join(toks)
    # plant shared passages
    shared = "a b c d e"
    for did in (3, 17, 29):
        texts[did] = texts[did] + " " + shared + " " + texts[did]

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_grams, r.n_spans, r.covered_tokens)
        for r in P.dup_passage_stats(df, n=3, min_docs=2).collect()
    }
    assert got == _ref_passage_stats(texts, n=3)


def test_hits_injection_equivalent(spark):
    """Passing a precomputed dup_hits frame must not change results."""
    df = _docs(spark, [(1, "a b c d e x y z"), (2, "q w a b c d r t")])
    base = P.dup_passage_stats(df, n=3).collect()
    inj = P.dup_passage_stats(df, n=3, hits=P.dup_hits(df, n=3)).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, inj))
