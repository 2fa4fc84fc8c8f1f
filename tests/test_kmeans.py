"""Lloyd-trained IVF cells: determinism, convergence quality (trained
recall must not lose to the label-column cells it replaces), and plan
shape (broadcast assignment, no vector shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import similarity as S
from corrie_spark.queries.registry import all_queries
from corrie_spark.tables import load
from tests.conftest import SF_CORRECT


def _avg_recall(df) -> float:
    rows = df.collect()
    return sum(r["recall_at_10"] for r in rows) / len(rows)


def test_trained_recall_at_least_label_recall(spark):
    """The r1 gap: IVF cells came from a label column, not a trainer.
    The trained coarse quantizer must match or beat it on recall@10
    (Lloyd tightens cells around the actual vector geometry)."""
    qs = all_queries()
    label = _avg_recall(qs["q_sim_ivf_recall"](spark, SF_CORRECT))
    trained = _avg_recall(qs["q_sim_ivf_trained_recall"](spark, SF_CORRECT))
    assert trained >= label, f"trained {trained} < label {label}"


def test_kmeans_deterministic_and_total(spark):
    """Same input -> identical assignment (md5 init, integer floor-mean
    centroids, tie-break on cell id), and every vector gets exactly one
    cell."""
    emb = load(spark, SF_CORRECT, "embeddings")
    a = {r["vid"]: r["cell"] for r in S.kmeans_cells(emb).collect()}
    b = {r["vid"]: r["cell"] for r in S.kmeans_cells(emb).collect()}
    assert a == b
    assert len(a) == emb.count()
    assert len(set(a.values())) > 1  # it actually partitions


def test_kmeans_iteration_reduces_cost(spark):
    """Lloyd invariant: total squared distance to the assigned
    centroid is non-increasing across iterations (here: strictly
    improves from the random md5 init)."""
    emb = load(spark, SF_CORRECT, "embeddings")

    def cost_of(assigned):
        cents = S._centroids_of(assigned)
        j = assigned.join(F.broadcast(cents), "cell")
        c = (
            S.int_norm_sq(F.col("qv"))
            + S.int_norm_sq(F.col("centroid"))
            - 2 * S.int_dot(F.col("qv"), F.col("centroid"))
        )
        return j.agg(F.sum(c)).first()[0]

    init = S.kmeans_cells(emb, n_iters=0)
    one = S.kmeans_cells(emb, n_iters=1)
    two = S.kmeans_cells(emb, n_iters=2)
    c0, c1, c2 = cost_of(init), cost_of(one), cost_of(two)
    assert c1 < c0
    assert c2 <= c1


def test_kmeans_assignment_is_map_only(spark):
    """Scale contract of the trainer: the assign step folds the
    driver-resident centroid set into a literal-array projection, so
    the final assignment plan is scan -> project with ZERO exchanges
    and no join at all. (The r4 version crossJoined broadcast
    centroids and took row_number over vid — a #vectors x #cells
    shuffle, 10^14 rows at realistic IVF scale.)"""
    from corrie_spark.plans import count_shuffles
    from corrie_spark.plans.inspect import explain_str

    df = all_queries()["q_sim_kmeans_cells"](spark, SF_CORRECT)
    s = explain_str(df)
    assert count_shuffles(df) == 0
    assert "Join" not in s
    assert "Window" not in s


def test_kmeans_assign_empty_centroids_yields_no_rows(spark):
    """Degenerate-path parity with the old crossJoin form: an empty
    centroid set assigns nothing (and must not be an analysis error
    from a zero-element array literal)."""
    emb = load(spark, SF_CORRECT, "embeddings")
    q = emb.select(F.col("vec_id").alias("vid"), S.quantize(F.col("embedding")).alias("qv"))
    out = S.kmeans_assign(q, [])
    assert out.columns == ["vid", "qv", "cell"]
    assert out.count() == 0


def test_pca_power_iteration_finds_dominant_direction(spark):
    """Synthetic anisotropic cloud: variance along the learned PC1
    must dominate variance along an arbitrary fixed direction."""
    import random

    from corrie_spark.operators import similarity as S

    rng = random.Random(3)
    rows = []
    for i in range(300):
        t = rng.uniform(-1, 1)
        vec = [0.0] * 64
        vec[0] = 0.9 * t + rng.uniform(-0.05, 0.05)   # dominant axis
        vec[1] = 0.1 * rng.uniform(-1, 1)             # minor axis
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cells = S.gram_cells(df).select("i", "j", "s_ij").collect()
    v = S.pca_power_iteration(cells)
    assert len(v) == 64 and max(abs(x) for x in v) == S.PCA_SCALE
    # PC1 must point (mostly) along dim 1
    assert abs(v[0]) == max(abs(x) for x in v)
    # deterministic: same input -> same vector
    assert v == S.pca_power_iteration(cells)

    from pyspark.sql import functions as F

    proj = S.pca_project(df, v)
    var_pc1 = proj.agg(F.variance("pc1")).collect()[0][0]
    other = [0] * 64
    other[5] = S.PCA_SCALE
    var_other = S.pca_project(df, other).agg(F.variance("pc1")).collect()[0][0]
    assert var_pc1 > 10 * (var_other + 1)


def test_kcenter_gonzalez_property(spark):
    """Farthest-point seeding invariant: every point's distance to its
    nearest seed is <= the minimum pairwise distance between seeds
    (each pick was the farthest remaining point, so seeds are mutually
    farther apart than anything left is from them)."""
    from corrie_spark.operators.similarity import kcenter_seeds, quantize
    from corrie_spark.tables import load
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    emb = load(spark, SF_SMOKE, "embeddings")
    seeds = kcenter_seeds(emb, k=4)
    vecs = [
        list(r["qv"])
        for r in emb.select(quantize(F.col("embedding")).alias("qv")).collect()
    ]

    def sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    svecs = [v for _, v in seeds]
    min_seed_pair = min(
        sqd(svecs[i], svecs[j])
        for i in range(len(svecs))
        for j in range(i + 1, len(svecs))
    )
    max_point = max(min(sqd(v, s) for s in svecs) for v in vecs)
    assert max_point <= min_seed_pair


def test_kcenter_deterministic_and_distinct(spark):
    from corrie_spark.operators.similarity import kcenter_seeds
    from corrie_spark.tables import load
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    a = kcenter_seeds(emb, k=4)
    b = kcenter_seeds(emb, k=4)
    assert a == b
    assert len({tuple(v) for _, v in a}) == 4


def test_seeding_quality_ordering(spark):
    """Training must pay for itself: 2-round Lloyd SSE < the md5
    random-partition init's SSE; the k-center spread also beats the
    random partition on this corpus (both oracle-pinned values, so
    this is a semantic regression guard, not a flaky metric)."""
    from corrie_spark.queries.registry import all_queries
    from tests.conftest import SF_CORRECT

    rows = {
        r["method"]: r["sse"]
        for r in all_queries()["q_sim_seeding_quality"](spark, SF_CORRECT).collect()
    }
    assert rows["lloyd2"] < rows["md5_init"]
    assert rows["kcenter"] < rows["md5_init"]
