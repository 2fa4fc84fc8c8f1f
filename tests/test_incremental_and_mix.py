"""Incremental (snapshot-over-snapshot) dedup and token-budget
mixture sampling: classification invariants, budget-overshoot bound,
determinism, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators.dedup import incremental_dedup
from corrie_spark.operators.packing import token_budget_sample
from corrie_spark.operators.text import prefix_fingerprint
from corrie_spark.queries.registry import all_queries
from corrie_spark.tables import load
from tests.conftest import SF_CORRECT


def _split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") % 4 == 3), docs.filter(F.col("doc_id") % 4 != 3)


def test_incremental_statuses_partition_the_batch(spark):
    """Every batch row gets exactly one status, and all three
    statuses occur on the test corpus (prefix fp collides by
    construction)."""
    batch, corpus = _split(spark, SF_CORRECT)
    out = incremental_dedup(batch, corpus, fp_fn=lambda t: prefix_fingerprint(t, 8))
    rows = out.collect()
    assert len(rows) == batch.count()
    statuses = {r["status"] for r in rows}
    assert statuses == {"fresh", "dup_in_batch", "dup_of_corpus"}


def test_incremental_corpus_precedence_and_keep_min(spark):
    """A fp present in the corpus marks EVERY batch copy
    dup_of_corpus; otherwise exactly the lowest batch id per fp is
    fresh and the rest are dup_in_batch."""
    batch, corpus = _split(spark, SF_CORRECT)
    rows = incremental_dedup(
        batch, corpus, fp_fn=lambda t: prefix_fingerprint(t, 8)
    ).collect()
    corpus_fps = {
        r["fp"]
        for r in corpus.select(prefix_fingerprint("text", 8).alias("fp")).collect()
    }
    by_fp: dict[str, list] = {}
    for r in rows:
        by_fp.setdefault(r["fp"], []).append(r)
    for fp, grp in by_fp.items():
        if fp in corpus_fps:
            assert all(g["status"] == "dup_of_corpus" for g in grp)
        else:
            fresh = [g for g in grp if g["status"] == "fresh"]
            assert len(fresh) == 1
            assert fresh[0]["doc_id"] == min(g["doc_id"] for g in grp)
            assert all(
                g["status"] == "dup_in_batch" for g in grp if g is not fresh[0]
            )


def test_incremental_screens_batch_not_corpus(spark):
    """Output rows come from the batch only — the corpus is a
    fingerprint set, never re-emitted."""
    batch, corpus = _split(spark, SF_CORRECT)
    out = incremental_dedup(batch, corpus, fp_fn=lambda t: prefix_fingerprint(t, 8))
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert {r["doc_id"] for r in out.collect()} <= batch_ids


def _sized(spark):
    from corrie_spark.operators.text import token_count

    docs = load(spark, SF_CORRECT, "documents")
    return docs.select(
        "source", "doc_id", token_count("text").cast("long").alias("n_tokens")
    )


def test_budget_sample_exclusive_bound_and_overshoot(spark):
    """Kept rows have before_tokens < budget (exclusive-count rule),
    so each source's total overshoots the budget by at most its last
    document."""
    budget = 500
    kept = token_budget_sample(_sized(spark), budget=budget).collect()
    by_src: dict[str, list] = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    for src, grp in by_src.items():
        assert all(r["before_tokens"] < budget for r in grp), src
        total = sum(r["n_tokens"] for r in grp)
        assert total - max(r["n_tokens"] for r in grp) < budget, src


def test_budget_sample_covers_every_source_and_is_deterministic(spark):
    sized = _sized(spark)
    a = {(r["source"], r["doc_id"]) for r in token_budget_sample(sized, 500).collect()}
    b = {(r["source"], r["doc_id"]) for r in token_budget_sample(sized, 500).collect()}
    assert a == b
    n_sources = sized.select("source").distinct().count()
    assert len({s for s, _ in a}) == n_sources  # budget>0 keeps >=1 doc each


def test_budget_sample_scales_with_budget(spark):
    """A bigger budget keeps a superset (the order is fixed; only the
    cut moves)."""
    sized = _sized(spark)
    small = {(r["source"], r["doc_id"]) for r in token_budget_sample(sized, 300).collect()}
    big = {(r["source"], r["doc_id"]) for r in token_budget_sample(sized, 900).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_plan_shapes(spark):
    """Incremental dedup stays on the fp key (bounded exchanges, no
    cross product); the mix sampler's offset join broadcasts."""
    from corrie_spark.plans import count_shuffles, has_broadcast_join
    from corrie_spark.plans.inspect import explain_str

    qs = all_queries()
    inc = qs["q_dedup_incremental"](spark, SF_CORRECT)
    s = explain_str(inc)
    assert "CartesianProduct" not in s and "NestedLoop" not in s
    assert count_shuffles(inc) <= 4  # batch fp agg + corpus distinct + co-keyed joins
    mix = qs["q_mix_budget_sample"](spark, SF_CORRECT)
    assert has_broadcast_join(mix)


def test_cluster_split_has_zero_leakage(spark):
    """Structural guarantee: splitting by cluster representative makes
    cross-split near-dup pairs impossible; the doc-hash policy leaks."""
    from corrie_spark.queries.registry import get
    from tests.conftest import SF_CORRECT

    row = get("q_split_leakage_audit").spark(spark, SF_CORRECT).collect()[0]
    assert row.n_cross_split_by_cluster == 0
    assert row.n_pairs > 0
    # the naive policy leaks on this corpus — the audit isn't vacuous
    assert row.n_cross_split_by_doc > 0


def test_cluster_split_counts_consistent(spark):
    from corrie_spark.queries.registry import get
    from tests.conftest import SF_CORRECT

    rows = get("q_split_by_cluster").spark(spark, SF_CORRECT).collect()
    assert sum(r.n_docs for r in rows) == 500  # every doc assigned once
    assert all(r.n_clusters <= r.n_docs for r in rows)


def test_temperature_sample_semantics(spark):
    """T=2 flattening: the largest source keeps everything; smaller
    sources keep a fraction >= their raw share; deterministic."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.packing import temperature_sample

    rows = [(i, "big" if i < 900 else "small", 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    marked = temperature_sample(df, temperature=2.0)
    rep = {
        r.source: r
        for r in marked.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("kept").cast("int")).alias("k"))
        .collect()
    }
    assert rep["big"].k == rep["big"].n  # max source keeps all
    # small keeps ~sqrt(100/900)=1/3 of its docs, way above raw share
    frac = rep["small"].k / rep["small"].n
    assert 0.15 < frac < 0.55
    # deterministic: second run identical
    again = {r.source: r.k for r in temperature_sample(df).groupBy("source")
             .agg(F.sum(F.col("kept").cast("int")).alias("k")).collect()}
    assert again == {s: rep[s].k for s in rep}


def test_temperature_sample_pow_path_monotone(spark):
    """T != 2 goes through pow(): higher temperature flattens more —
    the small source's keep-fraction must increase with T, and T=1
    must reduce to proportional (keep-fraction ~ raw share ratio)."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.packing import temperature_sample

    rows = [(i, "big" if i < 900 else "small", 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")

    def small_frac(t):
        rep = {
            r.source: (r.k, r.n)
            for r in temperature_sample(df, temperature=t)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("kept").cast("int")).alias("k"))
            .collect()
        }
        k, n = rep["small"]
        return k / n

    f1, f2, f4 = small_frac(1.0), small_frac(2.0), small_frac(4.0)
    assert f1 < f2 < f4  # more temperature -> more upsampling of small
    assert abs(f1 - 100 / 900) < 0.05  # T=1 ~ proportional acceptance


def test_weighted_sample_matches_python_aes_model(spark):
    """q_mix_weighted_sample == an independent python replay of the
    deterministic Efraimidis-Spirakis draw (md5-uniform, ln(u)/w key,
    top-k per source) — pinning the whole arithmetic chain, not just
    cross-engine agreement."""
    import hashlib
    import math

    from corrie_spark.queries.registry import all_queries
    from corrie_spark.tables import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_source: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        h = int(hashlib.md5(f"wrs:{r['doc_id']}".encode()).hexdigest()[:13], 16)
        u = (h + 1) / 4503599627370496.0
        neg_key = math.floor((math.log(u) / (r["n_chars"] + 1)) * -1000000.0)
        by_source.setdefault(r["source"], []).append((neg_key, r["doc_id"]))
    want = set()
    for src, keys in by_source.items():
        for rnk, (nk, did) in enumerate(sorted(keys)[:10], start=1):
            want.add((src, did, rnk))
    got = {
        (r["source"], r["doc_id"], r["rnk"])
        for r in all_queries()["q_mix_weighted_sample"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_weighted_sample_prefers_heavy_docs(spark):
    """Sampled docs must skew long: mean n_chars of the weighted
    sample exceeds the corpus mean (weight = n_chars + 1)."""
    from pyspark.sql import functions as F

    from corrie_spark.queries.registry import all_queries
    from corrie_spark.tables import load
    from tests.conftest import SF_CORRECT

    sample_mean = (
        all_queries()["q_mix_weighted_sample"](spark, SF_CORRECT)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    corpus_mean = (
        load(spark, SF_CORRECT, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_ls_classifier_beats_majority_baseline(spark):
    """The distilled linear scorer must rediscover enough of the
    rule's structure from raw counts to beat always-predict-majority
    on the training corpus."""
    from pyspark.sql import functions as F

    from corrie_spark.queries.registry import all_queries
    from corrie_spark.queries.text_queries import _LSC_LABEL
    from tests.conftest import SF_CORRECT

    [r] = all_queries()["q_text_ls_classifier"](spark, SF_CORRECT).collect()
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet')"
    )
    (n_pos,) = con.execute(
        f"SELECT SUM(CASE WHEN ({_LSC_LABEL}) = 1 THEN 1 ELSE 0 END) FROM documents"
    ).fetchone()
    majority = max(n_pos, r["n_docs"] - n_pos) / r["n_docs"]
    assert r["accuracy"] > majority
