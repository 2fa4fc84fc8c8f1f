"""Scale behavior of the vector-LSH family: plane count must grow with
the corpus so per-bucket quadratic candidate cost stays bounded, and
multi-table OR-amplification must be a candidate-superset of a single
table at the same plane count."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import similarity as S
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


def test_planes_scale_with_corpus():
    # expected bucket size n / 2^planes stays within 2x of target
    for n in [10_000, 1_000_000, 100_000_000, 10_000_000_000]:
        p = S.planes_for_corpus(n, target_bucket_size=256)
        if p < 24:  # below the cap the bound must hold
            assert n / 2**p <= 256, (n, p)
    # monotone growth across 6 orders of magnitude
    planes = [S.planes_for_corpus(10**e) for e in range(3, 12)]
    assert planes == sorted(planes)
    assert planes[-1] > planes[0]
    # tiny corpora never go below the floor (degenerate 1-bucket LSH)
    assert S.planes_for_corpus(10) >= 4
    # the cap bounds signature cost
    assert S.planes_for_corpus(10**15) <= 24


def test_bucket_count_grows_with_planes(spark):
    emb = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", S.quantize(F.col("embedding")).alias("qv")
    )
    counts = {}
    for n_planes in (4, 8, 12):
        counts[n_planes] = (
            emb.select(S.hyperplane_signature(F.col("qv"), n_planes).alias("b"))
            .distinct()
            .count()
        )
    assert counts[4] < counts[8] < counts[12]


def test_multitable_candidates_superset(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    one = S.ann_lsh_topk(q, emb, k=1000, n_planes=10, n_tables=1).select(
        "query_id", "neighbor_id"
    )
    two = S.ann_lsh_topk(q, emb, k=1000, n_planes=10, n_tables=2).select(
        "query_id", "neighbor_id"
    )
    # every single-table candidate pair survives OR-amplification
    assert one.exceptAll(two).count() == 0
    # and table 1 is a genuinely different hash family (adds candidates)
    assert two.count() >= one.count()


def test_auto_planes_runs_end_to_end(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 2)
    # 500 vectors, target 256 -> ceil(log2(500/256)) = 1 -> floor 4
    out = S.ann_lsh_topk(q, emb, k=5, n_planes=None).collect()
    assert 0 < len(out) <= 10
    assert {r.query_id for r in out} <= {0, 1}


def test_isotropy_sane_on_healthy_corpus(spark):
    """Synthetic embeddings are near-isotropic: collapse_score must be
    small and positive-ish; a score near 1 would mean directional
    collapse (and a bug here, since the corpus is random-like)."""
    from corrie_spark.queries.registry import all_queries
    from tests.conftest import SF_CORRECT

    rows = all_queries()["q_emb_isotropy"](spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r["n_vectors"] > 1
        assert r["avg_norm_sq"] > 0
        assert -0.1 < r["collapse_score"] < 0.5


def test_embedding_bucket_cap_bounds_hot_cluster(spark):
    """Embedding twin of the MinHash hot-band guard: a near-identical
    clique of 600 vectors costs the unguarded pair list ~180k rows;
    with bucket_cap the same corpus emits O(cap * n) rows and the
    clique still reaches connected components as ONE cluster (star
    candidates pass the cosine verify because the clique's pairwise
    cosines are far above threshold)."""
    import numpy as np

    from corrie_spark.operators import similarity as S
    from corrie_spark.operators.dedup import connected_components
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    base = rng.standard_normal(64)
    rows = []
    for i in range(600):  # near-identical clique
        rows.append((i, (base + 0.01 * rng.standard_normal(64)).tolist()))
    for i in range(600, 800):  # background noise vectors
        rows.append((i, rng.standard_normal(64).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = S.embedding_near_dups(df, threshold=0.9, bucket_cap=64)
    n_capped = capped.count()
    assert n_capped < 64 * 800  # O(cap * n), nowhere near 180k
    # the clique survives as one connected component
    cc = connected_components(
        capped.select("id_a", "id_b"), df.select("vec_id"), id_col="vec_id"
    )
    clique_labels = {
        r.cluster_id for r in cc.where(F.col("vec_id") < 600).collect()
    }
    assert clique_labels == {0}
    # control on a SLICE (full unguarded 600-clique is the blowup we
    # refuse to pay in a unit test): 150 clique members -> ~11k pairs
    slice_df = df.where((F.col("vec_id") < 150) | (F.col("vec_id") >= 600))
    unguarded = S.embedding_near_dups(slice_df, threshold=0.9).count()
    assert unguarded > 150 * 149 // 3  # quadratic shape confirmed


def test_embedding_collapse_exact_output_identical(spark):
    """Vector-hash exact-collapse-first is OUTPUT-IDENTICAL to the
    uncollapsed self-join: identical quantized vectors share every
    bucket and every cosine, so collapsing them to one rep through
    the LSH join and fanning verified pairs back out reproduces the
    exact pair list (values included)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows, i = [], 0
    for v in (rng.standard_normal(64) for _ in range(40)):
        for _ in range(rng.integers(1, 5)):
            rows.append((i, v.tolist()))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    on = S.embedding_near_dups(df, threshold=0.3, collapse_exact=True)
    off = S.embedding_near_dups(df, threshold=0.3, collapse_exact=False)
    assert on.exceptAll(off).count() == 0
    assert off.exceptAll(on).count() == 0


def test_embedding_cluster_edges_cc_invariant(spark):
    """The cluster-bound frame (bucket_cap + expand_members=False)
    yields IDENTICAL connected components to the exact pair list on a
    duplicate-heavy corpus — at a fraction of the edge count. This is
    the cap-invariance proof the shipped q_dedup_embedding_clusters
    path relies on."""
    import numpy as np

    from corrie_spark.operators.dedup import connected_components

    rng = np.random.default_rng(11)
    rows, i = [], 0
    for v in (rng.standard_normal(64) for _ in range(30)):
        for _ in range(rng.integers(1, 9)):  # byte-identical re-posts
            rows.append((i, v.tolist()))
            i += 1
    base = rng.standard_normal(64)
    for _ in range(50):  # near-identical but DISTINCT clique
        rows.append((i, (base + 0.01 * rng.standard_normal(64)).tolist()))
        i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = S.embedding_near_dups(df, threshold=0.3)
    edges = S.embedding_near_dups(
        df, threshold=0.3, bucket_cap=16, expand_members=False
    )
    assert edges.count() < exact.count()
    cc1 = connected_components(
        exact.select("id_a", "id_b"), df.select("vec_id"), id_col="vec_id"
    )
    cc2 = connected_components(
        edges.select("id_a", "id_b"), df.select("vec_id"), id_col="vec_id"
    )
    assert cc1.exceptAll(cc2).count() == 0
    assert cc2.exceptAll(cc1).count() == 0


def test_embedding_identical_clique_output_linear(spark):
    """600 byte-identical vectors: the cluster-bound frame emits O(n)
    rows (599 star edges + whatever the reps contribute), never the
    ~180k exact pairs — and the group still lands in one component."""
    import numpy as np

    from pyspark.sql import functions as F
    from corrie_spark.operators.dedup import connected_components

    rng = np.random.default_rng(3)
    v = rng.standard_normal(64).tolist()
    rows = [(i, v) for i in range(600)]
    rows += [(600 + i, rng.standard_normal(64).tolist()) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    edges = S.embedding_near_dups(
        df, threshold=0.9, bucket_cap=64, expand_members=False
    )
    n = edges.count()
    assert n < 3 * 700  # O(n), nowhere near 600*599/2
    cc = connected_components(
        edges.select("id_a", "id_b"), df.select("vec_id"), id_col="vec_id"
    )
    labels = {r.cluster_id for r in cc.where(F.col("vec_id") < 600).collect()}
    assert labels == {0}
