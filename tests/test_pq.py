"""Product-quantization operator contract (corrie_spark/operators/pq.py).

The oracle gate (q_sim_pq_topk / q_sim_pq_recall) pins end-to-end
values; these tests pin the index structure, determinism, the
empty-bucket edge, and the plan shape that makes PQ the scale path."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import pq
from corrie_spark.operators.similarity import quantize
from corrie_spark.plans import count_shuffles, has_broadcast_join
from corrie_spark.tables import load
from tests.conftest import SF_CORRECT


def _emb(spark):
    return load(spark, SF_CORRECT, "embeddings")


def test_codebooks_shape_and_determinism(spark):
    emb = _emb(spark)
    books = pq.pq_codebooks(emb)
    assert len(books) == pq.N_SUB
    for b in books:
        assert 1 <= len(b) <= pq.N_CODES
        assert all(len(v) == pq.SUB_DIM for _, v in b)
        assert [j for j, _ in b] == sorted(j for j, _ in b)
    # training is deterministic: md5 init + exact integer floor-means
    assert books == pq.pq_codebooks(emb)


def test_codes_in_range_and_stable(spark):
    emb = _emb(spark)
    books = pq.pq_codebooks(emb)
    valid = [{j for j, _ in b} for b in books]
    rows = pq.pq_encode(emb, books).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == pq.N_SUB
        for m, c in enumerate(r["codes"]):
            assert c in valid[m]


def test_encode_matches_python_argmin(spark):
    """The literal-centroid argmin equals a straight Python argmin
    with the same (cost, code) tie-break, for every subspace of a
    sample of vectors."""
    emb = _emb(spark)
    books = pq.pq_codebooks(emb)
    sample = (
        emb.filter(F.col("vec_id") < 20)
        .select("vec_id", quantize(F.col("embedding")).alias("qv"))
        .collect()
    )
    got = {
        r["vid"]: list(r["codes"])
        for r in pq.pq_encode(emb.filter(F.col("vec_id") < 20), books).collect()
    }
    for r in sample:
        qv = list(r["qv"])
        for m, book in enumerate(books):
            sv = qv[m * pq.SUB_DIM : (m + 1) * pq.SUB_DIM]
            best = min(
                (
                    (
                        sum(x * x for x in cent) - 2 * sum(a * b for a, b in zip(sv, cent)),
                        j,
                    )
                    for j, cent in book
                )
            )[1]
            assert got[r["vec_id"]][m] == best, (r["vec_id"], m)


def test_adc_score_is_sum_of_subspace_centroid_dots(spark):
    """approx_dot(query, neighbor) must equal the exact integer
    dot(query, reconstructed_neighbor) where the reconstruction is
    the per-subspace centroid of the neighbor's code — the defining
    identity of ADC."""
    emb = _emb(spark)
    books = pq.pq_codebooks(emb)
    codes = {r["vid"]: list(r["codes"]) for r in pq.pq_encode(emb, books).collect()}
    q = emb.filter(F.col("vec_id") < 2)
    qv = {
        r["vec_id"]: list(r["qv"])
        for r in q.select("vec_id", quantize(F.col("embedding")).alias("qv")).collect()
    }
    out = pq.pq_topk(q, emb, k=5, books=books)
    for r in out.collect():
        qvec, ncodes = qv[r["query_id"]], codes[r["neighbor_id"]]
        expect = 0
        for m, book in enumerate(books):
            cent = dict(book)[ncodes[m]]
            sv = qvec[m * pq.SUB_DIM : (m + 1) * pq.SUB_DIM]
            expect += sum(a * b for a, b in zip(sv, cent))
        assert r["approx_dot"] == expect


def test_empty_buckets_are_handled(spark):
    """A tiny corpus leaves some of the 16 init buckets empty; the
    codebook must shrink (not emit null centroids) and encode/score
    must still work against the smaller book."""
    tiny = _emb(spark).filter(F.col("vec_id") < 12)
    books = pq.pq_codebooks(tiny)
    assert any(len(b) < pq.N_CODES for b in books)
    out = pq.pq_topk(tiny.filter(F.col("vec_id") < 2), tiny, k=3, books=books)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all(r["approx_dot"] is not None for r in rows)


def test_pq_plan_shapes(spark):
    """Encode is MAP-ONLY (books fold to literals — zero exchanges);
    the scoring path broadcasts queries and shuffles only the bounded
    grouped top-k merge."""
    emb = _emb(spark)
    books = pq.pq_codebooks(emb)
    enc = pq.pq_encode(emb, books)
    assert count_shuffles(enc) == 0
    top = pq.pq_topk(emb.filter(F.col("vec_id") < 5), emb, k=10, books=books)
    assert has_broadcast_join(top)
    from corrie_spark.plans.inspect import explain_str

    assert "Window" not in explain_str(top)
    assert count_shuffles(top) == 1


def test_ivfpq_cell_equijoin_not_crossjoin(spark):
    """IVF+PQ: corpus codes join probed queries on the CELL key with
    the probe side broadcast — never a cartesian over the corpus; the
    only shuffle is the bounded top-k merge (+ the query-side probe
    window over Q x #cells rows, which is metadata-sized)."""
    from corrie_spark.plans.inspect import explain_str

    emb = _emb(spark)
    books = pq.pq_codebooks(emb)
    codes = pq.pq_encode(emb, books, carry_cols=("label",))
    top = pq.ivfpq_topk(
        emb.filter(F.col("vec_id") < 5), emb, k=10, books=books, codes=codes
    )
    s = explain_str(top)
    assert "CartesianProduct" not in s
    assert has_broadcast_join(top)
    rows = top.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(r["rnk"] <= 10 for r in rows)


def test_residual_ivfpq_recall_at_least_plain(spark):
    """The point of residual encoding: with the same codebook budget,
    approximating small residuals beats approximating full vectors —
    mean recall@10 of residual IVF-PQ must be >= the plain path's on
    this corpus."""
    from pyspark.sql import functions as F

    from corrie_spark.operators import pq
    from corrie_spark.operators.similarity import brute_force_topk
    from corrie_spark.tables import load
    from tests.conftest import SF_CORRECT

    emb = load(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = brute_force_topk(q, emb, k=10).select("query_id", "neighbor_id")

    def recall(approx):
        hits = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        return hits / truth.count()

    plain = pq.ivfpq_topk(q, emb, k=10, nprobe=2).select("query_id", "neighbor_id")
    resid = pq.ivfpq_residual_topk(q, emb, k=10, nprobe=2).select(
        "query_id", "neighbor_id"
    )
    r_plain, r_resid = recall(plain), recall(resid)
    assert r_resid >= r_plain
    # absolute recall is bounded by the probe coverage (nprobe=2 of 8
    # cells scans ~1/4 of the corpus); the gate is non-vacuity
    assert r_resid > 0.05


def test_residual_frame_exact_reconstruction(spark):
    """rv + centroid == qv exactly (integer residuals, no loss)."""
    from pyspark.sql import functions as F

    from corrie_spark.operators import pq
    from corrie_spark.operators.similarity import ivf_centroids, quantize
    from corrie_spark.tables import load
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    cents = ivf_centroids(emb, "label", "embedding", 64)
    res = pq.residual_frame(emb, cents)
    rejoined = res.join(F.broadcast(cents), "cell").select(
        "vid",
        F.zip_with(F.col("rv"), F.col("centroid"), lambda a, b: a + b).alias("back"),
    )
    orig = emb.select(
        F.col("vec_id").alias("vid"), quantize(F.col("embedding")).alias("qv")
    )
    bad = (
        rejoined.join(orig, "vid")
        .filter(F.col("back") != F.col("qv"))
        .count()
    )
    assert bad == 0


def test_refined_recall_at_least_residual(spark):
    """RefineFlat contract: exact re-rank of a wider ADC beam can only
    help — mean recall@10 of IVF-PQ + refine must be >= the unrefined
    residual stage's, and the refined top-k must be the exact-dot
    ordering of its own beam."""
    from pyspark.sql import functions as F

    from corrie_spark.operators import pq
    from corrie_spark.operators.similarity import brute_force_topk
    from corrie_spark.tables import load
    from tests.conftest import SF_CORRECT

    emb = load(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = brute_force_topk(q, emb, k=10).select("query_id", "neighbor_id")

    def recall(approx):
        hits = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        return hits / truth.count()

    resid = pq.ivfpq_residual_topk(q, emb, k=10, nprobe=2).select(
        "query_id", "neighbor_id"
    )
    refined = pq.ivfpq_refined_topk(q, emb, k=10, refine_factor=4, nprobe=2)
    r_resid, r_ref = recall(resid), recall(refined.select("query_id", "neighbor_id"))
    assert r_ref >= r_resid
    assert r_ref > 0.05
    # re-rank scores are the EXACT integer dots (spot check vs truth's
    # scorer on one query)
    exact = {
        (r.query_id, r.neighbor_id): r.dot
        for r in brute_force_topk(q, emb, k=200).collect()
    }
    for r in refined.collect():
        if (r.query_id, r.neighbor_id) in exact:
            assert r.dot == exact[(r.query_id, r.neighbor_id)]


# --- SQ8 scalar quantization ----------------------------------------------


def test_sq8_codes_in_range_and_deterministic(spark):
    emb = _emb(spark)
    bounds = pq.sq8_bounds(emb)
    assert len(bounds) == pq.DIM and all(lo <= hi for lo, hi in bounds)
    assert bounds == pq.sq8_bounds(emb)
    rows = pq.sq8_encode(emb, bounds).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == pq.DIM
        assert all(0 <= c <= 255 for c in r["codes"])


def test_sq8_encode_matches_python(spark):
    """Codes replicate the documented integer formula exactly."""
    emb = _emb(spark).limit(20)
    bounds = pq.sq8_bounds(_emb(spark))
    raw = {
        r["vec_id"]: r["qv"]
        for r in emb.select(
            "vec_id", quantize(F.col("embedding")).alias("qv")
        ).collect()
    }
    for r in pq.sq8_encode(emb, bounds).collect():
        qv = raw[r["vid"]]
        want = [
            ((x - lo) * 255) // max(hi - lo, 1)
            for x, (lo, hi) in zip(qv, bounds)
        ]
        assert list(r["codes"]) == want


def test_sq8_recall_beats_pq(spark):
    """SQ8 keeps per-dimension resolution (8x compression) so its
    recall@10 must be at least plain PQ's (64x compression) on this
    corpus — the memory/recall tradeoff the docstrings claim."""
    from corrie_spark.operators.similarity import brute_force_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, emb, k=10).collect()
    }

    def recall(res) -> float:
        hits = {(r["query_id"], r["neighbor_id"]) for r in res.collect()}
        return len(truth & hits) / len(truth)

    r_sq8 = recall(pq.sq8_topk(q, emb, k=10))
    r_pq = recall(pq.pq_topk(q, emb, k=10))
    assert r_sq8 >= r_pq
    assert r_sq8 >= 0.9  # near-lossless at 8 bits/dim


def test_sq8_topk_plan_is_broadcast_no_corpus_shuffle(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    bounds = pq.sq8_bounds(emb)
    codes = pq.sq8_encode(emb, bounds)
    plan = pq.sq8_topk(q, emb, k=10, bounds=bounds, codes=codes)
    assert has_broadcast_join(plan)
    # encode is map-only on the codes side; the only exchange is the
    # bounded partial-top-k merge (plus the broadcast build)
    assert count_shuffles(pq.sq8_encode(emb, bounds)) == 0


def test_matryoshka_cascade_recovers_prefix_loss(spark):
    """Full-dim re-rank over the 50-beam must do at least as well as
    prefix-only top-10 (it can only fix ranking within a superset of
    the prefix top-10), and should be near-exact at this beam size."""
    from corrie_spark.queries.registry import all_queries
    from tests.conftest import SF_CORRECT

    qs = all_queries()
    casc = {
        r["query_id"]: r["recall_at_10"]
        for r in qs["q_sim_matryoshka_cascade"](spark, SF_CORRECT).collect()
    }
    pref = {
        r["query_id"]: r["recall_at_10"]
        for r in qs["q_sim_matryoshka_recall"](spark, SF_CORRECT).collect()
    }
    assert set(casc) == set(pref)
    assert all(casc[k] >= pref[k] for k in casc)
    # these synthetic embeddings are not Matryoshka-trained, so the
    # 16-dim beam is genuinely lossy — the pin is the LIFT the exact
    # re-rank buys over prefix-only top-10, not an absolute recall
    assert sum(casc.values()) >= 2 * sum(pref.values())


def test_sq8_distortion_below_pq(spark):
    """8 bits/dim must be higher-fidelity than 1 byte/subspace: SQ8's
    mean ADC error < PQ's for every bench query — the mechanism
    behind test_sq8_recall_beats_pq."""
    from corrie_spark.queries.registry import all_queries
    from tests.conftest import SF_CORRECT

    rows = all_queries()["q_sim_distortion"](spark, SF_CORRECT).collect()
    err = {(r["method"], r["query_id"]): r["mean_abs_err"] for r in rows}
    qids = {q for m, q in err}
    assert all(err[("sq8", q)] < err[("pq", q)] for q in qids)


def test_sq8_adc_error_within_theoretical_bound(spark):
    """Midpoint reconstruction is off by at most half a cell per
    dimension: |recon_d - x_d| <= span_d div 512 + 1, so
    |ADC - exact| <= sum_d |q_d| * (span_d div 512 + 1). Pin the
    bound on every (query, corpus) pair at sf0.01."""
    from pyspark.sql import functions as F

    emb = _emb(spark)
    bounds = pq.sq8_bounds(emb)
    codes = pq.sq8_encode(emb, bounds)
    q = emb.filter(F.col("vec_id") < 5)
    approx = pq.sq8_topk(q, emb, k=10**9, bounds=bounds, codes=codes)
    exact = {}
    from corrie_spark.operators.similarity import quantize

    qv = {r["vec_id"]: list(r["q"]) for r in q.select("vec_id", quantize(F.col("embedding")).alias("q")).collect()}
    cv = {r["vec_id"]: list(r["q"]) for r in emb.select("vec_id", quantize(F.col("embedding")).alias("q")).collect()}
    spans = [hi - lo for lo, hi in bounds]
    for r in approx.collect():
        qvec, cvec = qv[r["query_id"]], cv[r["neighbor_id"]]
        ex = sum(a * b for a, b in zip(qvec, cvec))
        bound = sum(abs(a) * (s // 512 + 1) for a, s in zip(qvec, spans))
        assert abs(r["approx_dot"] - ex) <= bound
