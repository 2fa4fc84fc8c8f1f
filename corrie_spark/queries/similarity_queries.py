"""Oracle-checked similarity-search queries over `embeddings`.

All scores are exact integers (quantized dot products), so ranking
and values are bit-identical between Spark and DuckDB — see
corrie_spark.operators.similarity for the quantization argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.operators import similarity as S
from corrie_spark.queries.registry import register
from corrie_spark.tables import load

_QUANT = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 32768) AS BIGINT))"

_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, {_QUANT} AS qv
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id AS neighbor_id, {_QUANT} AS cv
  FROM embeddings
),
s AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i])) AS BIGINT) AS dot
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
),
r AS (
  SELECT query_id, neighbor_id, dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, rnk, dot FROM r WHERE rnk <= 10
"""


def _bf_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped memo of the brute-force top-10 ground truth for
    the 5 bench query vectors — consumed by q_sim_cosine_topk AND both
    recall queries (q_sim_ivf_recall, q_sim_ivf_trained_recall), which
    previously re-scored the full corpus once each. Same memo
    discipline as the dedup pair-graph and the trained-cells frame:
    keyed on (applicationId, sf_dir), persisted because three queries
    re-scan it. The truth set is 5 x 10 rows — persisting it is
    metadata-sized at any corpus scale."""
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        return (
            S.brute_force_topk(q, emb, k=10)
            .select("query_id", "neighbor_id", "rnk", "dot")
            .persist()
        )

    return _memo(spark, sf_dir, "bf_truth_k10", build)


@register("q_sim_cosine_topk", oracle=_TOPK_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 neighbors by (quantized) cosine for 5 query
    vectors: broadcast queries x corpus scan, partial per-partition
    top-k. The brute-force baseline the ANN path is measured against."""
    return _bf_truth(spark, sf_dir)


def _plane_w(p: str, d: str, table: int = 0) -> str:
    """DuckDB expr for the integer hyperplane weight of plane p, dim d
    in hash table `table` (salt mirrors similarity.hyperplane_signature:
    table 0 = 'plane{p}:', table t>0 = 'plane{t}:{p}:')."""
    prefix = "'plane'" if table == 0 else f"'plane{table}:'"
    return (
        f"(('0x' || substr(md5({prefix} || {p} || ':' || CAST({d} AS VARCHAR)), 1, 8))::BIGINT"
        f" - 2147483648)"
    )


def _bucket_sql(n_planes: int = 8, table: int = 0, vec: str = "qv") -> str:
    """DuckDB replay of hyperplane_signature(vec, n_planes, table)."""
    return (
        f"CAST(list_sum(list_transform(range(0, {n_planes}), p -> "
        "CASE WHEN CAST(list_sum(list_transform(range(0, 64), d -> "
        f"{vec}[d + 1] * {_plane_w('p', 'd', table)}"
        ")) AS BIGINT) >= 0 THEN CAST(2 ** p AS BIGINT) ELSE 0 END"
        ")) AS BIGINT)"
    )


_BUCKET = _bucket_sql(8, 0)

_ANN_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
sigs AS (
  SELECT vec_id, qv, {_BUCKET} AS bucket FROM base
),
q AS (SELECT vec_id AS query_id, qv AS q_vec, bucket FROM sigs WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, qv AS c_vec, bucket FROM sigs),
s AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * c_vec[i])) AS BIGINT) AS dot
  FROM c JOIN q USING (bucket)
  WHERE neighbor_id <> query_id
),
r AS (
  SELECT query_id, neighbor_id, dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, rnk, dot FROM r WHERE rnk <= 10
"""


@register("q_sim_ann_lsh", oracle=_ANN_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH buckets (8 planes)
    + exact re-rank inside buckets — the 100 TB path: cost per bucket,
    not all-pairs. Bucket bits are exact integer projections, so the
    oracle reproduces them bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.ann_lsh_topk(q, emb, k=10).select("query_id", "neighbor_id", "rnk", "dot")


_MP_PLANES = 10
_MP_B0 = _bucket_sql(_MP_PLANES, 0)
_MP_B1 = _bucket_sql(_MP_PLANES, 1)

_MULTIPROBE_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
sigs AS (
  SELECT vec_id, {_MP_B0} AS bucket0, {_MP_B1} AS bucket1 FROM base
),
q AS (SELECT vec_id AS query_id, bucket0, bucket1 FROM sigs WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, bucket0, bucket1 FROM sigs),
cand AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM c JOIN q ON (c.bucket0 = q.bucket0 OR c.bucket1 = q.bucket1)
  WHERE neighbor_id <> query_id
),
s AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(range(1, 65), i -> qb.qv[i] * cb.qv[i])) AS BIGINT) AS dot
  FROM cand
  JOIN base qb ON qb.vec_id = cand.query_id
  JOIN base cb ON cb.vec_id = cand.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, rnk, dot FROM r WHERE rnk <= 10
"""


@register("q_sim_ann_multiprobe", oracle=_MULTIPROBE_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified ANN: 2 independent 10-plane hash tables, candidate
    = collision in ANY table, exact re-rank once per distinct pair.

    This is the 100 TB shape for vector LSH: plane count scales with
    corpus size (planes_for_corpus keeps expected bucket size — and so
    per-bucket quadratic cost — constant), and the recall lost to
    smaller buckets is bought back with extra tables instead of bigger
    buckets. The oracle replays both salted plane families bit-for-bit
    and the OR-of-collisions candidate set."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.ann_lsh_topk(
        q, emb, k=10, n_planes=_MP_PLANES, n_tables=2
    ).select("query_id", "neighbor_id", "rnk", "dot")


_DIM = 64
_NPROBE = 2
_CENT_SUMS = ", ".join(f"SUM(qv[{i + 1}]) AS s{i}" for i in range(_DIM))
_CENT_LIST = ", ".join(
    f"CAST(floor(CAST(s{i} AS DOUBLE) / n) AS BIGINT)" for i in range(_DIM)
)

_IVF_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(label AS BIGINT) AS cell, {_QUANT} AS qv FROM embeddings
),
cent AS (
  SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM base GROUP BY cell
),
centv AS (
  SELECT cell, [{_CENT_LIST}] AS centroid FROM cent
),
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
probe AS (
  SELECT query_id, cell,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                i -> q_vec[i] * centroid[i])) AS BIGINT) DESC, cell) AS cell_rnk
  FROM q CROSS JOIN centv
),
s AS (
  SELECT query_id, vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}),
              i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM probe
  JOIN base USING (cell)
  JOIN q USING (query_id)
  WHERE cell_rnk <= {_NPROBE} AND vec_id <> query_id
),
r AS (
  SELECT query_id, neighbor_id, dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, rnk, dot FROM r WHERE rnk <= 10
"""


def _ivf_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the IVF coarse quantizer (cell -> centroid, a
    #cells x dim integer table). The centroid table is the other half
    of the IVF index next to the memoized codes frames — at scale it
    is trained once and persisted with the index, so the serving-path
    queries should probe it, not re-derive it from a full corpus scan
    (posexplode + two exchanges) on every run. Exact integers, so the
    memoized frame is bit-identical to the inline recompute."""
    from corrie_spark.operators.similarity import ivf_centroids
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        # localCheckpoint (not lazy persist): the table is metadata-sized
        # (#cells x dim longs), and truncating the build lineage keeps the
        # serving-path plans free of the trainer's posexplode exchanges
        # (same rule as every other _memo frame; plan pins count only
        # serving shuffles).
        emb = load(spark, sf_dir, "embeddings")
        return ivf_centroids(emb, "label", "embedding", _DIM).localCheckpoint(
            eager=True
        )

    return _memo(spark, sf_dir, "ivf_cents", build)


@register("q_sim_ivf", oracle=_IVF_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: per-cell integer centroids (floor-mean), probe
    the top-2 cells per query by centroid dot product, exact re-rank
    inside probed cells only. The inverted-file scale path: ~nprobe/
    #cells of the corpus scored per query, centroids broadcast."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(q, emb, k=10, nprobe=_NPROBE, cents=_ivf_cents(spark, sf_dir))


_BUCKET_STATS_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
sigs AS (
  SELECT vec_id, {_BUCKET} AS bucket FROM base
)
SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
FROM sigs GROUP BY bucket
"""


@register("q_sim_bucket_stats", oracle=_BUCKET_STATS_ORACLE)
def q_sim_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket histogram — the skew diagnostic you'd run before
    trusting the ANN join at scale (hot buckets -> add planes or
    multi-probe)."""
    emb = load(spark, sf_dir, "embeddings")
    sigs = emb.select(
        "vec_id", S.quantize(F.col("embedding")).alias("q")
    # pass the column NAME: the string form takes the one-expr-string
    # fast path (1 py4j call) instead of ~10 round trips per plane
    ).withColumn("bucket", S.hyperplane_signature("q"))
    return sigs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


_RECALL_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(label AS BIGINT) AS cell, {_QUANT} AS qv FROM embeddings
),
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
exact_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
exact_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM exact_s
),
truth AS (SELECT query_id, neighbor_id FROM exact_r WHERE rnk <= 10),
cent AS (
  SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM base GROUP BY cell
),
centv AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM cent),
probe AS (
  SELECT query_id, cell,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                i -> q_vec[i] * centroid[i])) AS BIGINT) DESC, cell) AS cell_rnk
  FROM q CROSS JOIN centv
),
ivf_s AS (
  SELECT query_id, vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}),
              i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM probe JOIN base USING (cell) JOIN q USING (query_id)
  WHERE cell_rnk <= {_NPROBE} AND vec_id <> query_id
),
ivf_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM ivf_s
),
approx AS (SELECT query_id, neighbor_id FROM ivf_r WHERE rnk <= 10)
SELECT t.query_id,
       COUNT(*) AS k_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_10
FROM truth t
LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY t.query_id
ORDER BY t.query_id
"""


@register("q_sim_ivf_recall", oracle=_RECALL_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the IVF path against brute-force ground truth, per
    query — the metric you tune nprobe against before trusting ANN at
    scale. Both sides computed in-engine; exact integer ranking makes
    the recall itself deterministic and oracle-checkable."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")
    approx = S.ivf_topk(
        q, emb, k=10, nprobe=_NPROBE, cents=_ivf_cents(spark, sf_dir)
    ).select("query_id", F.col("neighbor_id").alias("hit_id"))
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# --- k-means-trained IVF (Lloyd in DataFrame ops; oracle replays it) ------

_KM_CELLS = 8
_KM_ITERS = 2


def _trained_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped memo of the Lloyd training output (vid, qv,
    cell), shared by q_sim_kmeans_cells and q_sim_ivf_trained_recall —
    the training trajectory (2 rounds of collect + reassign) was the
    single most expensive thing in the bench and was computed twice
    per run. Same memo discipline as the dedup pair-graph
    (dedup_queries._memo): keyed on (applicationId, sf_dir),
    persisted because both queries re-scan it."""
    from corrie_spark.queries.dedup_queries import _memo

    return _memo(
        spark,
        sf_dir,
        "kmeans_cells",
        lambda: S.kmeans_cells(
            load(spark, sf_dir, "embeddings"), n_cells=_KM_CELLS, n_iters=_KM_ITERS
        ).persist(),
    )


def _km_ctes(n_iters: int) -> str:
    """CTE chain a0..a{n}: the DuckDB replay of kmeans_cells — same
    md5-bucket init, same exact-integer floor-mean centroids, same
    argmin(||c||^2 - 2 v.c) assignment with ties to the lowest cell."""
    dist = (
        "CAST(list_sum(list_transform(range(1, 65), i -> c.centroid[i] * c.centroid[i])) AS BIGINT)"
        " - 2 * CAST(list_sum(list_transform(range(1, 65), i -> b.qv[i] * c.centroid[i])) AS BIGINT)"
    )
    parts = [
        "a0 AS (SELECT vec_id, qv, CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT"
        f" % {_KM_CELLS} AS BIGINT) AS cell FROM base)"
    ]
    for t in range(n_iters):
        parts.append(
            f"kcent{t} AS (SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM a{t} GROUP BY cell)"
        )
        parts.append(f"kcentv{t} AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM kcent{t})")
        parts.append(
            f"a{t + 1} AS (SELECT vec_id, qv, cell FROM ("
            "SELECT b.vec_id, b.qv, c.cell, ROW_NUMBER() OVER ("
            f"PARTITION BY b.vec_id ORDER BY {dist} ASC, c.cell ASC) AS r "
            f"FROM base b CROSS JOIN kcentv{t} c) t WHERE r = 1)"
        )
    return ",\n".join(parts)


_KM_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_km_ctes(_KM_ITERS)}
SELECT vec_id, cell FROM a{_KM_ITERS}
"""


@register("q_sim_kmeans_cells", oracle=_KM_ORACLE)
def q_sim_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd-trained IVF cell assignment (2 iterations, 8 cells) —
    the coarse-quantizer trainer run IN-ENGINE instead of relying on a
    label column. Exact integer arithmetic end to end, so the full
    training trajectory (not just the final metric) is oracle-checked
    bit-for-bit. Per round: one #cells x dim shuffle + a MAP-ONLY
    literal-centroid reassignment — no join, no vector shuffle."""
    return _trained_cells(spark, sf_dir).select(F.col("vid").alias("vec_id"), "cell")


_TRAINED_RECALL_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_km_ctes(_KM_ITERS)},
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
exact_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
exact_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM exact_s
),
truth AS (SELECT query_id, neighbor_id FROM exact_r WHERE rnk <= 10),
fcent AS (
  SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM a{_KM_ITERS} GROUP BY cell
),
fcentv AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM fcent),
probe AS (
  SELECT query_id, cell,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                i -> q_vec[i] * centroid[i])) AS BIGINT) DESC, cell) AS cell_rnk
  FROM q CROSS JOIN fcentv
),
ivf_s AS (
  SELECT query_id, vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}),
              i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM probe JOIN a{_KM_ITERS} USING (cell) JOIN q USING (query_id)
  WHERE cell_rnk <= {_NPROBE} AND vec_id <> query_id
),
ivf_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM ivf_s
),
approx AS (SELECT query_id, neighbor_id FROM ivf_r WHERE rnk <= 10)
SELECT t.query_id,
       COUNT(*) AS k_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_10
FROM truth t
LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY t.query_id
ORDER BY t.query_id
"""


def _trained_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the TRAINED coarse quantizer's centroid table —
    the `_ivf_cents` discipline one index over: at scale the trained
    centroids persist with the index, so the serving path probes them
    instead of re-deriving them (posexplode + two exchanges) from a
    corpus scan on every run. Exact integers; bit-identical to the
    inline recompute."""
    from corrie_spark.operators.similarity import ivf_centroids
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        cells = _trained_cells(spark, sf_dir).select(
            F.col("vid").alias("vec_id"), F.col("cell").alias("trained_cell")
        )
        return ivf_centroids(
            emb.join(cells, "vec_id"), "trained_cell", "embedding", _DIM
        ).localCheckpoint(eager=True)

    return _memo(spark, sf_dir, "trained_cents", build)


@register("q_sim_ivf_trained_recall", oracle=_TRAINED_RECALL_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ivf_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of IVF over Lloyd-TRAINED cells vs brute-force truth
    — the end-to-end gate for the in-engine trainer
    (tests/test_kmeans.py additionally pins trained-recall >= the
    label-cell recall of q_sim_ivf_recall)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")
    approx = S.ivf_topk_trained(
        q,
        emb,
        k=10,
        nprobe=_NPROBE,
        n_cells=_KM_CELLS,
        n_iters=_KM_ITERS,
        cells=_trained_cells(spark, sf_dir),
        cents=_trained_cents(spark, sf_dir),
    ).select("query_id", F.col("neighbor_id").alias("hit_id"))
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# --- product quantization (ADC) — see corrie_spark/operators/pq.py ---------

_PQ_SUB_SUMS = ", ".join(f"SUM(sv[{d + 1}]) AS s{d}" for d in range(8))
_PQ_CENT_LIST = ", ".join(
    f"CAST(floor(CAST(s{d} AS DOUBLE) / n) AS BIGINT)" for d in range(8)
)
_PQ_SUBDOT = (
    "CAST(list_sum(list_transform(range(1, 9), i -> {a}[i] * {b}[i])) AS BIGINT)"
)

# the full DuckDB replay of pq_codebooks + pq_encode + per-query LUTs:
# md5-bucket init per (vector, subspace), floor-mean centroids, argmin
# encode (ties to lowest code), exact subspace dot products
_PQ_CTES = f"""
sub AS (
  SELECT vec_id, m, list_slice(qv, m * 8 + 1, m * 8 + 8) AS sv,
         CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':' || CAST(m AS VARCHAR)), 1, 15))::BIGINT % 16 AS BIGINT) AS j
  FROM base, range(0, 8) t(m)
),
csum AS (SELECT m, j, COUNT(*) AS n, {_PQ_SUB_SUMS} FROM sub GROUP BY m, j),
centb AS (SELECT m, j, [{_PQ_CENT_LIST}] AS centroid FROM csum),
cnormb AS (
  SELECT m, j, centroid,
         {_PQ_SUBDOT.format(a='centroid', b='centroid')} AS cn
  FROM centb
),
enc AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT s.vec_id, s.m, c.j,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
             c.cn - 2 * {_PQ_SUBDOT.format(a='s.sv', b='c.centroid')} ASC, c.j ASC) AS r
    FROM sub s JOIN cnormb c USING (m)
  ) WHERE r = 1
),
qsub AS (
  SELECT vec_id AS query_id, m, list_slice(qv, m * 8 + 1, m * 8 + 8) AS sv
  FROM base, range(0, 8) t(m) WHERE vec_id < 5
),
lut AS (
  SELECT query_id, c.m, c.j,
         {_PQ_SUBDOT.format(a='qs.sv', b='c.centroid')} AS d
  FROM qsub qs JOIN cnormb c USING (m)
),
pq_score AS (
  SELECT l.query_id, e.vec_id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS approx_dot
  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.code
  WHERE e.vec_id <> l.query_id
  GROUP BY l.query_id, e.vec_id
),
pq_r AS (
  SELECT query_id, neighbor_id, approx_dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) AS rnk
  FROM pq_score
)"""

# index-only slice of _PQ_CTES (codebooks + codes + query LUTs, no
# full-corpus scoring) — composed by the IVF+PQ oracle below, which
# restricts scoring to probed cells
_PQ_INDEX_CTES = _PQ_CTES[: _PQ_CTES.index(",\npq_score")]

_PQ_TOPK_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_PQ_CTES.lstrip()}
SELECT query_id, neighbor_id, rnk, approx_dot FROM pq_r WHERE rnk <= 10
"""


def _pq_index(spark: SparkSession, sf_dir: str):
    """Session-scoped memo of (codebooks, persisted codes frame) —
    the PQ index is trained once and shared by q_sim_pq_topk and
    q_sim_pq_recall, exactly like the kmeans trained-cells memo. The
    codes frame is the thing you'd persist as the index at scale:
    8 bytes per vector vs 512 raw."""
    from corrie_spark.operators import pq
    from corrie_spark.queries.dedup_queries import _memo

    def build():
        emb = load(spark, sf_dir, "embeddings")
        books = pq.pq_codebooks(emb)
        # carry the IVF cell so q_sim_ivfpq_topk shares the same
        # persisted codes frame (plain-PQ callers just ignore it)
        codes = pq.pq_encode(emb, books, carry_cols=("label",)).persist()
        return (books, codes)

    return _memo(spark, sf_dir, "pq_index", build)


@register("q_sim_pq_topk", oracle=_PQ_TOPK_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 by product quantization + asymmetric
    distance: 8 subspaces x 16 codes (8-byte codes, 64x compression),
    per-query lookup tables, 8 adds per candidate. Training, codes,
    and ADC scores are exact integers, so the oracle replays the
    whole index bit-for-bit."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    books, codes = _pq_index(spark, sf_dir)
    return pq.pq_topk(q, emb, k=10, books=books, codes=codes)


_PQ_RECALL_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_PQ_CTES.lstrip()},
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
exact_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
exact_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM exact_s
),
truth AS (SELECT query_id, neighbor_id FROM exact_r WHERE rnk <= 10),
approx AS (SELECT query_id, neighbor_id FROM pq_r WHERE rnk <= 10)
SELECT t.query_id,
       COUNT(*) AS k_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_10
FROM truth t
LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY t.query_id
ORDER BY t.query_id
"""


@register("q_sim_pq_recall", oracle=_PQ_RECALL_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the PQ/ADC path against brute-force truth — how
    much ranking quality 64x compression costs, per query. Reuses the
    memoized ground truth and PQ index; both sides exact."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")
    books, codes = _pq_index(spark, sf_dir)
    approx = pq.pq_topk(q, emb, k=10, books=books, codes=codes).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


_IVFPQ_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(label AS BIGINT) AS cell, {_QUANT} AS qv FROM embeddings
),
{_PQ_INDEX_CTES.lstrip()},
ivfcent AS (
  SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM base GROUP BY cell
),
ivfcentv AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM ivfcent),
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
probe AS (
  SELECT query_id, cell,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
           CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                i -> q_vec[i] * centroid[i])) AS BIGINT) DESC, cell) AS cell_rnk
  FROM q CROSS JOIN ivfcentv
),
cand AS (
  SELECT p.query_id, b.vec_id AS neighbor_id
  FROM probe p JOIN base b USING (cell)
  WHERE p.cell_rnk <= {_NPROBE} AND b.vec_id <> p.query_id
),
ipq_score AS (
  SELECT c.query_id, c.neighbor_id, CAST(SUM(l.d) AS BIGINT) AS approx_dot
  FROM cand c
  JOIN enc e ON e.vec_id = c.neighbor_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = e.m AND l.j = e.code
  GROUP BY c.query_id, c.neighbor_id
),
ipq_r AS (
  SELECT query_id, neighbor_id, approx_dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) AS rnk
  FROM ipq_score
)
SELECT query_id, neighbor_id, rnk, approx_dot FROM ipq_r WHERE rnk <= 10
"""


@register("q_sim_ivfpq_topk", oracle=_IVFPQ_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ: probe the top-2 coarse cells by centroid dot, then
    ADC-score only the 8-byte PQ codes inside probed cells — the
    composed 100 TB layout (candidate count cut by IVF, per-candidate
    cost cut by PQ). Shares the session PQ index memo; the corpus-side
    codes frame joins probed queries on the cell key and never
    shuffles."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    books, codes = _pq_index(spark, sf_dir)
    return pq.ivfpq_topk(
        q, emb, k=10, nprobe=_NPROBE, books=books, codes=codes,
        cents=_ivf_cents(spark, sf_dir),
    )


# --- SemDeDup (Abbas et al. 2023): kmeans cells + within-cell cosine ------

_SEM_TAU = 0.35  # same corpus-tuned threshold as q_dedup_embedding


def _semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the within-cell Gram pair frame — the pairs
    query and the survivors report both consume it, and the Arrow
    Gram stage (plus the trainer upstream) should run once per
    session, not per consumer."""
    from corrie_spark.queries.dedup_queries import _memo

    return _memo(
        spark,
        sf_dir,
        "semdedup_pairs",
        lambda: S.semdedup_pairs(
            _trained_cells(spark, sf_dir), threshold=_SEM_TAU
        ).persist(),
    )

_SEM_CTES = f"""
{{km}}
,cl AS (
  SELECT vec_id, qv, cell,
         CAST(list_sum(list_transform(range(1, {{dim}} + 1), i -> qv[i] * qv[i])) AS BIGINT) AS nrm
  FROM a{{iters}}
),
sem_pairs AS (
  SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_sum(list_transform(range(1, {{dim}} + 1), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot,
         a.nrm AS na, b.nrm AS nb
  FROM cl a JOIN cl b ON a.cell = b.cell AND a.vec_id < b.vec_id
),
sem_hits AS (
  SELECT cell, id_a, id_b, dot,
         CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
  FROM sem_pairs
  WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= {_SEM_TAU}
)"""


def _sem_ctes() -> str:
    return _SEM_CTES.format(
        km=f"WITH base AS (\n  SELECT vec_id, {_QUANT} AS qv FROM embeddings\n),\n{_km_ctes(_KM_ITERS)}",
        dim=_DIM,
        iters=_KM_ITERS,
    )


_SEMDEDUP_PAIRS_ORACLE = f"""
{_sem_ctes()}
SELECT cell, id_a, id_b, dot, cos FROM sem_hits
ORDER BY cell, id_a, id_b
"""


@register("q_semdedup_pairs", oracle=_SEMDEDUP_PAIRS_ORACLE, python_stages="per-cell numpy Gram block (applyInPandas)")
def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic near-dup pairs: cosine >= 0.35 restricted to
    within-Lloyd-cell blocks — the clustering bound that replaces
    all-pairs with k independent blocks. The full trainer trajectory
    is replayed by the oracle, so cell membership AND pair scores are
    checked bit-for-bit (dot exact-int, cos one IEEE div over exact
    ints). Shares the session trained-cells memo with
    q_sim_kmeans_cells."""
    return _semdedup_pairs(spark, sf_dir).orderBy("cell", "id_a", "id_b")


_SEMDEDUP_REPORT_ORACLE = f"""
{_sem_ctes()},
sem_dropped AS (SELECT DISTINCT id_b FROM sem_hits)
SELECT c.cell,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(d.id_b) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - COUNT(d.id_b) AS BIGINT) AS n_kept
FROM cl c LEFT JOIN sem_dropped d ON c.vec_id = d.id_b
GROUP BY c.cell
ORDER BY c.cell
"""


@register("q_semdedup_survivors", oracle=_SEMDEDUP_REPORT_ORACLE, python_stages="consumes the same Gram pair frame")
def q_semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell SemDeDup pruning report under the deterministic
    keep-min-id representative policy — what fraction of each
    semantic cluster a training-data build would drop at tau=0.35."""
    return S.semdedup_cell_report(
        _trained_cells(spark, sf_dir),
        threshold=_SEM_TAU,
        pairs=_semdedup_pairs(spark, sf_dir),
    )


# --- exact distributed covariance (Gram sums) over embeddings -------------

_COV_TOPK = 15

_COV_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
cells AS (
  SELECT i, j,
         CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS s_ij,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base, UNNEST(range(1, {_DIM + 1})) AS a(i), UNNEST(range(1, {_DIM + 1})) AS b(j)
  WHERE i <= j
  GROUP BY i, j
),
means AS (
  SELECT i AS d, CAST(SUM(qv[i]) AS BIGINT) AS s1
  FROM base, UNNEST(range(1, {_DIM + 1})) AS a(i)
  GROUP BY i
),
cov AS (
  SELECT c.i, c.j,
         c.n * c.s_ij - mi.s1 * mj.s1 AS cov_num  -- n^2 * cov, exact
  FROM cells c JOIN means mi ON c.i = mi.d JOIN means mj ON c.j = mj.d
)
SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
       CAST(cov_num AS BIGINT) AS cov_num
FROM cov
WHERE i < j
ORDER BY abs(cov_num) DESC, i, j
LIMIT {_COV_TOPK}
"""


@register("q_emb_covariance", oracle=_COV_ORACLE, python_stages="gram_cells: one numpy X^T X per Arrow batch")
def q_emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed covariance: the strongest 15 off-diagonal
    entries of the embedding covariance matrix as EXACT integers
    (cov_num = n^2 * cov over quantized vectors; n*s_ij - s_i*s_j) —
    the PCA/whitening prep computation. One numpy X^T X per Arrow
    batch (see gram_cells) emits dim^2/2 partial cells per batch; the
    shuffle is dim^2-bounded regardless of corpus size and the full
    matrix is metadata (64x64) at any scale. |qv|<=2^19 keeps cell
    sums < 2^63 to n ~ 10^6 rows; at larger n switch the cell sums
    to DECIMAL(38,0) — same plan.
    """
    emb = load(spark, sf_dir, "embeddings")
    cells = S.gram_cells(emb, "embedding", dim=_DIM)
    cov = cells.select(
        "i",
        "j",
        (F.col("n") * F.col("s_ij") - F.col("s1_i") * F.col("s1_j")).alias("cov_num"),
    )
    return (
        cov.filter(F.col("i") < F.col("j"))
        .select(
            F.col("i").cast("bigint").alias("dim_i"),
            F.col("j").cast("bigint").alias("dim_j"),
            F.col("cov_num").cast("bigint").alias("cov_num"),
        )
        .orderBy(F.abs("cov_num").desc(), "dim_i", "dim_j")
        .limit(_COV_TOPK)
    )


# --- in-engine PCA: integer power iteration, bit-exact replay -------------

_PCA_ITERS = 3
_PCA_S = 1 << 20  # similarity.PCA_SCALE


def _pca_round(r: int) -> str:
    prev = f"pv{r - 1}"
    return f"""pw{r} AS (
  SELECT list_transform(range(1, {_DIM + 1}),
           i -> CAST(list_sum(list_transform(range(1, {_DIM + 1}), j -> m[i][j] * v[j])) AS BIGINT)) AS w
  FROM {prev} CROSS JOIN pmat
),
pn{r} AS (SELECT w, greatest(list_max(list_transform(w, y -> abs(y))), 1) AS mx FROM pw{r}),
pv{r} AS (
  SELECT list_transform(w, x -> CASE WHEN x >= 0
            THEN CAST((CAST(x AS HUGEINT) * {_PCA_S}) // mx AS BIGINT)
            ELSE CAST(-((CAST(-x AS HUGEINT) * {_PCA_S}) // mx) AS BIGINT) END) AS v
  FROM pn{r}
)"""


_PCA_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
gcell AS (
  SELECT i, j, CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS s_ij
  FROM base, UNNEST(range(1, {_DIM + 1})) AS a(i), UNNEST(range(1, {_DIM + 1})) AS b(j)
  WHERE i <= j GROUP BY i, j
),
gfull AS (
  SELECT i, j, s_ij FROM gcell
  UNION ALL SELECT j, i, s_ij FROM gcell WHERE i <> j
),
pmrow AS (
  SELECT i, list(CASE WHEN s_ij >= 0 THEN s_ij // {_PCA_S}
                      ELSE -((-s_ij) // {_PCA_S}) END ORDER BY j) AS mr
  FROM gfull GROUP BY i
),
pmat AS (SELECT list(mr ORDER BY i) AS m FROM pmrow),
pv0 AS (SELECT list_transform(range(1, {_DIM + 1}), x -> CAST({_PCA_S} AS BIGINT)) AS v),
{",".join(_pca_round(r) for r in range(1, _PCA_ITERS + 1))},
proj AS (
  SELECT d.source,
         CASE WHEN raw >= 0 THEN CAST(floor(CAST(raw AS DOUBLE) / {_PCA_S}) AS BIGINT)
              ELSE -CAST(floor(CAST(-raw AS DOUBLE) / {_PCA_S}) AS BIGINT) END AS pc1
  FROM (
    SELECT b.vec_id,
           CAST(list_sum(list_transform(range(1, {_DIM + 1}), k -> b.qv[k] * v[k])) AS BIGINT) AS raw
    FROM base b CROSS JOIN pv{_PCA_ITERS}
  ) r JOIN documents d ON d.doc_id = r.vec_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(pc1) AS BIGINT) AS s1,
       CAST(SUM(pc1 * pc1) AS BIGINT) AS s2,
       CAST(SUM(pc1) AS DOUBLE) / COUNT(*) AS pc1_mean
FROM proj
GROUP BY source
ORDER BY source
"""


@register("q_emb_pca_source", oracle=_PCA_ORACLE)
def q_emb_pca_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine PCA: dominant Gram eigenvector by EXACT-INTEGER
    power iteration (driver holds only the 64x64 cell collect — the
    kmeans-centroid discipline), corpus projected onto it map-only,
    per-source projection sums reported as exact integers. The
    oracle replays the iteration arithmetic bit-for-bit (guarded
    truncating divisions, HUGEINT renormalization products), so the
    eigenvector itself — not just summary stats — is cross-engine
    pinned through the projections."""
    emb = load(spark, sf_dir, "embeddings")
    cells = S.gram_cells(emb, "embedding", dim=_DIM).select("i", "j", "s_ij").collect()
    v = S.pca_power_iteration(cells, dim=_DIM, n_iters=_PCA_ITERS)
    proj = S.pca_project(emb, v)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        proj.join(docs, proj.vec_id == docs.doc_id)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pc1").cast("bigint").alias("s1"),
            F.sum(F.col("pc1") * F.col("pc1")).cast("bigint").alias("s2"),
            (F.sum("pc1").cast("double") / F.count(F.lit(1))).alias("pc1_mean"),
        )
        .orderBy("source")
    )


# --- residual IVF-PQ (the faithful FAISS layout) --------------------------

# residual PQ chain: the plain-PQ index CTEs with the codebook/enc
# side re-targeted at residual vectors (rv); query-side LUTs stay
# over the RAW query subvectors (ADC decomposition: dot(q, x) ~
# dot(q, c_cell) + sum_m lut[m][code]).
_RES_PQ_CTES = _PQ_INDEX_CTES.replace(
    "sub AS (\n  SELECT vec_id, m, list_slice(qv, m * 8 + 1, m * 8 + 8) AS sv,",
    "sub AS (\n  SELECT vec_id, m, list_slice(rv, m * 8 + 1, m * 8 + 8) AS sv,",
).replace(
    "FROM base, range(0, 8) t(m)\n),\ncsum",
    "FROM rbase, range(0, 8) t(m)\n),\ncsum",
)

_IVFPQ_RES_RECALL_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(label AS BIGINT) AS cell, {_QUANT} AS qv FROM embeddings
),
rcent AS (
  SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM base GROUP BY cell
),
rcentv AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM rcent),
rbase AS (
  SELECT b.vec_id, b.cell,
         list_transform(range(1, {_DIM + 1}), i -> b.qv[i] - cv.centroid[i]) AS rv
  FROM base b JOIN rcentv cv USING (cell)
),
{_RES_PQ_CTES.lstrip()},
rprobe AS (
  SELECT query_id, cell, cell_dot FROM (
    SELECT q.query_id, cv.cell,
           CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                i -> q.qv[i] * cv.centroid[i])) AS BIGINT) AS cell_dot,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                  i -> q.qv[i] * cv.centroid[i])) AS BIGINT) DESC, cv.cell) AS cell_rnk
    FROM (SELECT vec_id AS query_id, qv FROM base WHERE vec_id < 5) q
    CROSS JOIN rcentv cv
  ) t WHERE cell_rnk <= {_NPROBE}
),
rcand AS (
  SELECT p.query_id, p.cell_dot, b.vec_id AS neighbor_id
  FROM rprobe p JOIN base b USING (cell)
  WHERE b.vec_id <> p.query_id
),
rscore AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(c.cell_dot + SUM(l.d) AS BIGINT) AS approx_dot
  FROM rcand c
  JOIN enc e ON e.vec_id = c.neighbor_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = e.m AND l.j = e.code
  GROUP BY c.query_id, c.neighbor_id, c.cell_dot
),
rr AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) AS rnk
  FROM rscore
),
rapprox AS (SELECT query_id, neighbor_id FROM rr WHERE rnk <= 10),
exact_s AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> q.qv[i] * b.qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN (SELECT vec_id, qv FROM base WHERE vec_id < 5) q
  WHERE b.vec_id <> q.vec_id
),
exact_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM exact_s
),
rtruth AS (SELECT query_id, neighbor_id FROM exact_r WHERE rnk <= 10)
SELECT t.query_id,
       COUNT(*) AS k_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_10
FROM rtruth t
LEFT JOIN rapprox a USING (query_id, neighbor_id)
GROUP BY t.query_id
ORDER BY t.query_id
"""


def _res_pq_index(spark: SparkSession, sf_dir: str):
    """Session memo of the RESIDUAL PQ index (books, persisted codes)
    — the residual trainer runs once per (session, sf), same
    discipline as _pq_index."""
    from corrie_spark.operators import pq
    from corrie_spark.queries.dedup_queries import _memo

    def build():
        emb = load(spark, sf_dir, "embeddings")
        cents = _ivf_cents(spark, sf_dir)
        res = pq.residual_frame(emb, cents)
        books = pq.pq_codebooks(res, id_col="vid", vec_col="rv", quantized=True)
        codes = pq.pq_encode(
            res, books, id_col="vid", vec_col="rv",
            carry_cols=("cell",), quantized=True,
        ).persist()
        return (books, codes)

    return _memo(spark, sf_dir, "res_pq_index", build)


@register("q_sim_ivfpq_res_recall", oracle=_IVFPQ_RES_RECALL_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ivfpq_res_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of RESIDUAL IVF-PQ (codebooks over vector-minus-
    centroid residuals, ADC = probe-time cell dot + residual lookups
    — the faithful FAISS layout) vs brute-force truth. The oracle
    replays residual training, encoding, probing, and the decomposed
    scores exactly; tests/test_pq.py pins recall >= the plain IVFPQ
    path's."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")
    books, codes = _res_pq_index(spark, sf_dir)
    approx = pq.ivfpq_residual_topk(
        q, emb, k=10, nprobe=_NPROBE, books=books, codes=codes,
        cents=_ivf_cents(spark, sf_dir),
    ).select("query_id", F.col("neighbor_id").alias("hit_id"))
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


_IVFPQ_RES_TOPK_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(label AS BIGINT) AS cell, {_QUANT} AS qv FROM embeddings
),
rcent AS (
  SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM base GROUP BY cell
),
rcentv AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM rcent),
rbase AS (
  SELECT b.vec_id, b.cell,
         list_transform(range(1, {_DIM + 1}), i -> b.qv[i] - cv.centroid[i]) AS rv
  FROM base b JOIN rcentv cv USING (cell)
),
{_RES_PQ_CTES.lstrip()},
rprobe AS (
  SELECT query_id, cell, cell_dot FROM (
    SELECT q.query_id, cv.cell,
           CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                i -> q.qv[i] * cv.centroid[i])) AS BIGINT) AS cell_dot,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                  i -> q.qv[i] * cv.centroid[i])) AS BIGINT) DESC, cv.cell) AS cell_rnk
    FROM (SELECT vec_id AS query_id, qv FROM base WHERE vec_id < 5) q
    CROSS JOIN rcentv cv
  ) t WHERE cell_rnk <= {_NPROBE}
),
rcand AS (
  SELECT p.query_id, p.cell_dot, b.vec_id AS neighbor_id
  FROM rprobe p JOIN base b USING (cell)
  WHERE b.vec_id <> p.query_id
),
rscore AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(c.cell_dot + SUM(l.d) AS BIGINT) AS approx_dot
  FROM rcand c
  JOIN enc e ON e.vec_id = c.neighbor_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = e.m AND l.j = e.code
  GROUP BY c.query_id, c.neighbor_id, c.cell_dot
),
rr AS (
  SELECT query_id, neighbor_id, approx_dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) AS rnk
  FROM rscore
)
SELECT query_id, neighbor_id, rnk, approx_dot FROM rr WHERE rnk <= 10
"""


@register("q_sim_ivfpq_res_topk", oracle=_IVFPQ_RES_TOPK_ORACLE, python_stages="partial top-k consumer (local_topk mapInPandas)")
def q_sim_ivfpq_res_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ top-10 (the value-level twin of the recall
    gate): probed cells' decomposed ADC scores checked row-for-row
    against the oracle's replay of residual training + encoding +
    probing. Shares the session residual-index memo."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    books, codes = _res_pq_index(spark, sf_dir)
    return pq.ivfpq_residual_topk(
        q, emb, k=10, nprobe=_NPROBE, books=books, codes=codes,
        cents=_ivf_cents(spark, sf_dir),
    ).select("query_id", "neighbor_id", "rnk", "approx_dot")


# --- IVF-PQ + refine (FAISS RefineFlat): exact re-rank of the ADC beam -----

_REFINE_FACTOR = 4

# the refined oracle = the residual-recall oracle with the approx side
# widened to a k*refine_factor ADC beam, exact-dot re-ranked via an
# id-keyed join back to the raw (quantized) vectors
_REFINE_BLOCK = f"""rbeam AS (SELECT query_id, neighbor_id FROM rr WHERE rnk <= {10 * _REFINE_FACTOR}),
refsc AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> q.qv[i] * b.qv[i])) AS BIGINT) AS dot
  FROM rbeam c
  JOIN base b ON b.vec_id = c.neighbor_id
  JOIN base q ON q.vec_id = c.query_id
),
refr AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM refsc
),
rapprox AS (SELECT query_id, neighbor_id FROM refr WHERE rnk <= 10),"""

_RES_RAPPROX = "rapprox AS (SELECT query_id, neighbor_id FROM rr WHERE rnk <= 10),"
assert _RES_RAPPROX in _IVFPQ_RES_RECALL_ORACLE
_IVFPQ_REFINED_ORACLE = _IVFPQ_RES_RECALL_ORACLE.replace(
    _RES_RAPPROX, _REFINE_BLOCK
)


@register("q_sim_ivfpq_refined_recall", oracle=_IVFPQ_REFINED_ORACLE, python_stages="partial-top-k consumer (refine re-rank)")
def q_sim_ivfpq_refined_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of residual IVF-PQ + REFINE (exact integer re-rank of
    the top-40 ADC candidates against raw vectors fetched by id-keyed
    broadcast join — the FAISS RefineFlat layer). tests/test_pq.py
    pins refined recall >= the unrefined residual stage's; the oracle
    replays beam + re-rank exactly. Shares the session residual-index
    memo and the brute-force-truth memo."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")
    books, codes = _res_pq_index(spark, sf_dir)
    approx = pq.ivfpq_refined_topk(
        q,
        emb,
        k=10,
        refine_factor=_REFINE_FACTOR,
        nprobe=_NPROBE,
        books=books,
        codes=codes,
        cents=_ivf_cents(spark, sf_dir),
    ).select("query_id", F.col("neighbor_id").alias("hit_id"))
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


_SRC_CENTROID_ORACLE = f"""
WITH base AS (
  SELECT d.source, {_QUANT} AS qv
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
sums AS (
  SELECT source,
         list_transform(range(1, {_DIM + 1}),
           i -> CAST(list_sum(list_transform(qvs, v -> v[i])) AS BIGINT)) AS sv
  FROM (SELECT source, list(qv) AS qvs FROM base GROUP BY source) g
),
pairsC AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> a.sv[i] * b.sv[i])) AS BIGINT) AS dot,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> a.sv[i] * a.sv[i])) AS BIGINT) AS na,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> b.sv[i] * b.sv[i])) AS BIGINT) AS nb
  FROM sums a JOIN sums b ON a.source < b.source
)
SELECT source_a, source_b,
       CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS centroid_cosine
FROM pairsC
ORDER BY source_a, source_b
"""


@register("q_emb_source_centroids", oracle=_SRC_CENTROID_ORACLE)
def q_emb_source_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-drift diagnostic: pairwise cosine between per-source
    embedding SUM vectors (cos of sums == cos of means; sums stay
    exact integers, so the compare is engine-exact). Per-source sums
    are one partial-agg shuffle of dim longs per source; the pair
    table is #sources^2/2 rows of driver-free arithmetic."""
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    base = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source", S.quantize(F.col("embedding")).alias("qv")
    )
    exploded = base.select(
        "source", F.posexplode("qv").alias("i", "x")
    )
    sums = (
        exploded.groupBy("source", "i")
        .agg(F.sum("x").cast("bigint").alias("s"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_list(F.struct("i", "s"))).alias("parts"))
        .select(
            "source",
            F.transform(F.col("parts"), lambda p: p["s"]).alias("sv"),
        )
    )
    a = sums.select(F.col("source").alias("source_a"), F.col("sv").alias("va"))
    b = sums.select(F.col("source").alias("source_b"), F.col("sv").alias("vb"))
    # #sources rows: broadcast the build side so the inequality join
    # plans as BroadcastNestedLoop (sanctioned scalar/cross shape),
    # never an unbroadcast CartesianProduct
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    return (
        pairs.select(
            "source_a",
            "source_b",
            S.cosine_from_int(
                S.int_dot(F.col("va"), F.col("vb")),
                S.int_norm_sq(F.col("va")),
                S.int_norm_sq(F.col("vb")),
            ).alias("centroid_cosine"),
        )
        .orderBy("source_a", "source_b")
    )


# --- Matryoshka prefix-dim retrieval (MRL-style truncation) ----------------

_MAT_DIM = 16

_MAT_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
exact_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
exact_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM exact_s
),
truth AS (SELECT query_id, neighbor_id FROM exact_r WHERE rnk <= 10),
mat_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_MAT_DIM + 1}), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
mat_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM mat_s
),
approx AS (SELECT query_id, neighbor_id FROM mat_r WHERE rnk <= 10)
SELECT t.query_id,
       COUNT(*) AS k_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_10
FROM truth t
LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY t.query_id
ORDER BY t.query_id
"""


@register("q_sim_matryoshka_recall", oracle=_MAT_ORACLE, python_stages="partial-top-k consumer (prefix dims)")
def q_sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of retrieval over the FIRST {_MAT_DIM} embedding
    dimensions vs full-dim ground truth — the Matryoshka-representation
    tradeoff (4x less memory/bandwidth per comparison when the model
    front-loads information; with these synthetic embeddings the
    recall is the honest junk-dims answer, which is the point of
    measuring before trusting a truncation).

    100 TB shape: identical to the exact baseline — broadcast query
    set over one corpus scan, per-partition partial top-k, the only
    exchange carries ~#queries x k rows; the prefix slice happens in
    the scan projection so only 1/4 of the vector bytes flow through
    scoring. Full-dim truth rides the session memo."""
    emb = load(spark, sf_dir, "embeddings")
    emb16 = emb.select(
        "vec_id", F.slice("embedding", 1, _MAT_DIM).alias("emb_mat")
    )
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")
    approx = S.brute_force_topk(
        emb16.filter(F.col("vec_id") < 5), emb16, k=10, vec_col="emb_mat"
    ).select("query_id", F.col("neighbor_id").alias("hit_id"))
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )



# --- SQ8 scalar quantization ----------------------------------------------

_SQ8_CTES = f"""
dimstats AS (
  SELECT d, MIN(qv[d + 1]) AS lo, MAX(qv[d + 1]) AS hi
  FROM base CROSS JOIN range(0, {_DIM}) r(d) GROUP BY d
),
bounds AS (
  SELECT list(lo ORDER BY d) AS mins, list(hi - lo ORDER BY d) AS spans
  FROM dimstats
),
enc AS (
  SELECT vec_id,
         list_transform(range(0, {_DIM}),
           d -> ((qv[d + 1] - mins[d + 1]) * 255) // greatest(spans[d + 1], 1)) AS codes
  FROM base CROSS JOIN bounds
),
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
sq8_s AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(0, {_DIM}), d ->
           q_vec[d + 1] * (mins[d + 1] + ((2 * e.codes[d + 1] + 1) * spans[d + 1]) // 512)
         )) AS BIGINT) AS approx_dot
  FROM enc e CROSS JOIN q CROSS JOIN bounds
  WHERE e.vec_id <> query_id
),
sq8_r AS (
  SELECT query_id, neighbor_id, approx_dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) AS rnk
  FROM sq8_s
)"""

_SQ8_TOPK_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_SQ8_CTES.lstrip()}
SELECT query_id, neighbor_id, rnk, approx_dot FROM sq8_r WHERE rnk <= 10
"""


def _sq8_index(spark: SparkSession, sf_dir: str):
    """Session memo of (bounds, persisted codes) — the SQ8 index is
    one corpus pass to train (per-dim min/max) and one map-only pass
    to encode; topk and recall share it like the PQ memo."""
    from corrie_spark.operators import pq
    from corrie_spark.queries.dedup_queries import _memo

    def build():
        emb = load(spark, sf_dir, "embeddings")
        bounds = pq.sq8_bounds(emb)
        codes = pq.sq8_encode(emb, bounds).persist()
        codes.count()
        return (bounds, codes)

    return _memo(spark, sf_dir, "sq8_index", build)


@register("q_sim_sq8_topk", oracle=_SQ8_TOPK_ORACLE, python_stages="partial-top-k consumer (SQ8 ADC)")
def q_sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 by SQ8 scalar quantization + ADC: per-dim
    [min, max] split into 256 cells, 1 byte per dimension (8x
    compression), score = <query, cell midpoint> in exact BIGINT.
    The FAISS ScalarQuantizer(QT_8bit) point on the memory/recall
    curve: coarser than raw, far finer geometry than PQ's 8-byte
    codes. Codes frame scanned once; queries broadcast; partial
    top-k bounds the exchange."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    bounds, codes = _sq8_index(spark, sf_dir)
    return pq.sq8_topk(q, emb, k=10, bounds=bounds, codes=codes)


_SQ8_RECALL_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_SQ8_CTES.lstrip()},
exact_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
exact_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM exact_s
),
truth AS (SELECT query_id, neighbor_id FROM exact_r WHERE rnk <= 10),
approx AS (SELECT query_id, neighbor_id FROM sq8_r WHERE rnk <= 10)
SELECT t.query_id,
       COUNT(*) AS k_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_10
FROM truth t
LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY t.query_id
ORDER BY t.query_id
"""


@register("q_sim_sq8_recall", oracle=_SQ8_RECALL_ORACLE, python_stages="same")
def q_sim_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the SQ8/ADC path against brute-force truth — what
    8x compression costs in ranking quality (expected near-1.0: SQ8
    keeps per-dimension resolution, unlike PQ). Rides the memoized
    truth and index."""
    from corrie_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")
    bounds, codes = _sq8_index(spark, sf_dir)
    approx = pq.sq8_topk(q, emb, k=10, bounds=bounds, codes=codes).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# --- bench warmup: build-once-probe-many via the index store --------------


def warm_ann_indexes(spark: SparkSession, sf_dir: str, root: str | None = None) -> str:
    """Seed the session's trained-index memos through
    `operators/index_store`: load each index from the on-disk store
    when present, else train it once and SAVE it. After this runs,
    every ANN query in the registry probes a persisted index — the
    steady-state, build-once-probe-many workflow a deployment runs —
    instead of paying first-rep training inside a timed query.

    Loaded indexes are bit-identical to fresh-trained ones (exact
    integer training; pinned by tests/test_index_store.py), so
    correctness results cannot depend on whether the store was warm.
    """
    import os

    from corrie_spark.operators import index_store as IS
    from corrie_spark.operators import pq
    from corrie_spark.queries.dedup_queries import _memo

    if root is None:
        from corrie_spark.tables import dataset_fingerprint

        base = os.environ.get("CORRIE_INDEX_CACHE") or os.path.join(
            os.getcwd(), "spark-warehouse", "ann_indexes"
        )
        # content-fingerprinted so a regenerated embeddings.parquet
        # under the same path never serves stale trained codebooks
        # (round-7 advice)
        root = os.path.join(
            base,
            os.path.basename(os.path.normpath(sf_dir))
            + "_"
            + dataset_fingerprint(sf_dir, "embeddings"),
        )

    def stored(path: str) -> bool:
        return os.path.exists(os.path.join(path, "pq_codes", "_SUCCESS"))

    def warm_pq(memo_key: str, subdir: str, fresh) -> None:
        path = os.path.join(root, subdir)

        def build():
            books, codes = IS.load_pq_index(spark, path)
            codes = codes.persist()
            codes.count()
            return (books, codes)

        if stored(path):
            _memo(spark, sf_dir, memo_key, build)  # seeds iff not present
        else:
            books, codes = fresh()  # trains AND memoizes
            IS.save_pq_index(spark, path, books, codes)

    warm_pq("pq_index", "pq", lambda: _pq_index(spark, sf_dir))
    warm_pq("res_pq_index", "res_pq", lambda: _res_pq_index(spark, sf_dir))

    # k-means IVF cells: (vid, cell) inverted file; qv re-attached from
    # the corpus on load (index_store stores no vectors)
    km_path = os.path.join(root, "kmeans")

    def build_km():
        cells = IS.load_ivf_index(
            spark, km_path, corpus=load(spark, sf_dir, "embeddings")
        ).persist()
        cells.count()
        return cells

    if os.path.exists(os.path.join(km_path, "ivf_cells", "_SUCCESS")):
        _memo(spark, sf_dir, "kmeans_cells", build_km)
    else:
        IS.save_ivf_index(km_path, _trained_cells(spark, sf_dir))

    # SQ8: per-dim training bounds + 1-byte/dim codes (round-7 #5 —
    # every trained artifact persists, not just PQ/IVF)
    sq8_path = os.path.join(root, "sq8")

    def build_sq8():
        bounds, codes = IS.load_sq8_index(spark, sq8_path)
        codes = codes.persist()
        codes.count()
        return (bounds, codes)

    if os.path.exists(os.path.join(sq8_path, "sq8_codes", "_SUCCESS")):
        _memo(spark, sf_dir, "sq8_index", build_sq8)
    else:
        bounds, codes = _sq8_index(spark, sf_dir)  # trains AND memoizes
        IS.save_sq8_index(spark, sq8_path, bounds, codes)

    # k-center: persist the SEEDS (k x dim ints); the cell assignment
    # is a deterministic map-only projection, replayed at load —
    # bit-identical because seeding and assignment are exact-integer
    kc_path = os.path.join(root, "kcenter")

    def assign_from(seed_source):
        def build():
            emb = load(spark, sf_dir, "embeddings")
            q = emb.select(
                F.col("vec_id").alias("vid"),
                S.quantize(F.col("embedding")).alias("qv"),
            )
            out = S.kmeans_assign(q, seed_source()).persist()
            out.count()
            return out

        return build

    if os.path.exists(os.path.join(kc_path, "seeds", "_SUCCESS")):
        _memo(
            spark, sf_dir, "kcenter_cells",
            assign_from(lambda: IS.load_seeds(spark, kc_path)),
        )
    else:
        seeds = S.kcenter_seeds(load(spark, sf_dir, "embeddings"), k=_KC_K)
        IS.save_seeds(spark, kc_path, seeds)
        _memo(spark, sf_dir, "kcenter_cells", assign_from(lambda: seeds))

    # IVF coarse-quantizer centroids: the metadata half of the IVF/
    # IVF-PQ index (#cells x dim longs) — built once with the index so
    # the serving queries probe it instead of re-deriving it from a
    # full corpus scan per run
    _ivf_cents(spark, sf_dir).count()
    _trained_cents(spark, sf_dir).count()
    return root


# --- k-center (farthest-point) seeding -------------------------------------

_KC_K = 8


def _kcenter_ctes(k: int) -> str:
    """CTE chain s0..s{k-1} + kseeds + kassign: the DuckDB replay of
    kcenter_seeds (lowest-id start, argmax-of-min full squared
    distance, ties to the lowest id) and the nearest-seed assignment
    (ties to the lowest cell = pick order)."""

    def d(t: str) -> str:
        return (
            f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
            f" i -> (b.qv[i] - {t}.qv[i]) * (b.qv[i] - {t}.qv[i]))) AS BIGINT)"
        )

    parts = ["s0 AS (SELECT vec_id, qv FROM base ORDER BY vec_id LIMIT 1)"]
    for j in range(1, k):
        joins = " ".join(f"CROSS JOIN s{i} t{i}" for i in range(j))
        mind = (
            d("t0") if j == 1
            else "least(" + ", ".join(d(f"t{i}") for i in range(j)) + ")"
        )
        parts.append(
            f"s{j} AS (SELECT b.vec_id, b.qv FROM base b {joins}"
            f" ORDER BY {mind} DESC, b.vec_id ASC LIMIT 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS cell, qv FROM s{j}" for j in range(k)
    )
    parts.append(f"kseeds AS ({union})")
    dc = (
        f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
        " i -> (b.qv[i] - c.qv[i]) * (b.qv[i] - c.qv[i]))) AS BIGINT)"
    )
    parts.append(
        "kassign AS (SELECT vec_id, cell FROM ("
        "SELECT b.vec_id, c.cell, ROW_NUMBER() OVER ("
        f"PARTITION BY b.vec_id ORDER BY {dc} ASC, c.cell ASC) AS r "
        "FROM base b CROSS JOIN kseeds c) t WHERE r = 1)"
    )
    return ",\n".join(parts)


_KCENTER_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_kcenter_ctes(_KC_K)}
SELECT vec_id, cell FROM kassign
"""


def _kcenter_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the k-center assignment (seeding pays k corpus
    scans — once per session, like the Lloyd trajectory memo)."""
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        seeds = S.kcenter_seeds(emb, k=_KC_K)
        q = emb.select(
            F.col("vec_id").alias("vid"), S.quantize(F.col("embedding")).alias("qv")
        )
        return S.kmeans_assign(q, seeds).persist()

    return _memo(spark, sf_dir, "kcenter_cells", build)


@register("q_sim_kcenter_cells", oracle=_KCENTER_ORACLE)
def q_sim_kcenter_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point (Gonzalez k-center) seeded cell assignment —
    the deterministic kmeans++-class initializer next to the
    md5-partition init: seeds are corpus extremes, so no two initial
    centers start near-coincident. Seeding is k map-only scans of the
    persisted quantized frame (argmax-of-min distance as a literal
    projection + 1-row max_by agg — zero joins); assignment is the
    same literal-centroid array_min projection as kmeans_assign. The
    full seed trajectory AND the assignment are exact-integer and
    oracle-replayed bit-for-bit."""
    return _kcenter_cells(spark, sf_dir).select(
        F.col("vid").alias("vec_id"), F.col("cell").cast("bigint").alias("cell")
    )


# --- seeding-quality comparison (quantization error per init) --------------


def _sse_blocks() -> str:
    """Per-method CTE blocks: join the method's assignment back to the
    quantized vectors, recompute floor-mean centroids, and sum exact
    squared distances (per-vector distance fits int64; the corpus SUM
    goes through DECIMAL(38,0) — at 10^10 vectors an int64 SSE sum
    would wrap)."""
    d = (
        f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
        " i -> (j.qv[i] - c.centroid[i]) * (j.qv[i] - c.centroid[i]))) AS BIGINT)"
    )
    blocks, selects = [], []
    for m, tbl in [
        ("kcenter", "kassign"),
        ("lloyd2", f"a{_KM_ITERS}"),
        ("md5_init", "a0"),
    ]:
        blocks.append(
            f"j_{m} AS (SELECT t.cell, b.qv FROM {tbl} t JOIN base b USING (vec_id))"
        )
        blocks.append(
            f"cs_{m} AS (SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM j_{m} GROUP BY cell)"
        )
        blocks.append(f"cv_{m} AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM cs_{m})")
        blocks.append(
            f"sse_{m} AS (SELECT '{m}' AS method,"
            " CAST(COUNT(*) AS BIGINT) AS n_vectors,"
            f" CAST(CAST(SUM(CAST({d} AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) AS sse"
            f" FROM j_{m} j JOIN cv_{m} c USING (cell))"
        )
        selects.append(f"SELECT * FROM sse_{m}")
    return ",\n".join(blocks) + "\n" + " UNION ALL ".join(selects) + " ORDER BY method"


_SEEDING_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_km_ctes(_KM_ITERS)},
{_kcenter_ctes(_KC_K)},
{_sse_blocks()}
"""


@register("q_sim_seeding_quality", oracle=_SEEDING_ORACLE, python_stages="rides the trained/kcenter memos (local_topk lineage)")
def q_sim_seeding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cell quantization error (SSE to the floor-mean centroid)
    for the three coarse-quantizer initializations side by side —
    md5-partition init, 2-round Lloyd, and farthest-point k-center —
    the measurement that justifies paying for training: Lloyd must
    beat the md5 partition, and k-center shows what spread-only
    seeding buys before any refinement. All three assignments ride
    their session memos; each SSE is one broadcast centroid join +
    a 2-column agg. Exact integers end to end (corpus sum in
    DECIMAL(38,0) — int64 wraps at ~10^10 vectors), so the whole
    comparison is oracle-replayed bit-for-bit."""

    def sse_of(assigned: DataFrame, method: str) -> DataFrame:
        cents = S._centroids_of(assigned, _DIM)
        d = (
            "aggregate(zip_with(qv, centroid, (a, b) -> (a - b) * (a - b)),"
            " 0L, (acc, x) -> acc + x)"
        )
        return (
            assigned.join(F.broadcast(cents), "cell")
            .select(F.expr(d).alias("d"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
                F.sum(F.col("d").cast("decimal(38,0)")).cast("double").alias("sse"),
            )
            .select(F.lit(method).alias("method"), "n_vectors", "sse")
        )

    emb = load(spark, sf_dir, "embeddings")
    md5_init = S.kmeans_cells(emb, n_cells=_KM_CELLS, n_iters=0)
    return (
        sse_of(_kcenter_cells(spark, sf_dir), "kcenter")
        .unionAll(sse_of(_trained_cells(spark, sf_dir), "lloyd2"))
        .unionAll(sse_of(md5_init, "md5_init"))
        .orderBy("method")
    )


# --- incremental index maintenance (IVF upsert) ----------------------------

_UPS_MOD = 10  # ~10% of vectors arrive as the incoming batch

_UPS_HASH = (
    "(('0x' || substr(md5('upsert:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT"
    f" % {_UPS_MOD})"
)

_UPS_INC_SUMS = ", ".join(f"SUM(qv[{i + 1}]) AS t{i}" for i in range(_DIM))
_UPS_MERGED = ", ".join(
    f"CAST(floor(CAST(c.s{i} + COALESCE(i.t{i}, 0) AS DOUBLE)"
    f" / (c.n + COALESCE(i.n_inc, 0))) AS BIGINT) AS m{i}"
    for i in range(_DIM)
)
_UPS_OLD = ", ".join(
    f"CAST(floor(CAST(c.s{i} AS DOUBLE) / c.n) AS BIGINT) AS o{i}" for i in range(_DIM)
)
_UPS_DRIFT = " + ".join(f"(m{i} - o{i}) * (m{i} - o{i})" for i in range(_DIM))

_UPSERT_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings WHERE {_UPS_HASH} <> 0
),
{_km_ctes(_KM_ITERS)},
cent2 AS (SELECT cell, COUNT(*) AS n, {_CENT_SUMS} FROM a{_KM_ITERS} GROUP BY cell),
centv2 AS (SELECT cell, [{_CENT_LIST}] AS centroid FROM cent2),
inc AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings WHERE {_UPS_HASH} = 0
),
iassign AS (
  SELECT vec_id, qv, cell FROM (
    SELECT b.vec_id, b.qv, c.cell, ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
      CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> c.centroid[i] * c.centroid[i])) AS BIGINT)
      - 2 * CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> b.qv[i] * c.centroid[i])) AS BIGINT) ASC,
      c.cell ASC) AS r
    FROM inc b CROSS JOIN centv2 c) t WHERE r = 1
),
isum AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_inc, {_UPS_INC_SUMS}
  FROM iassign GROUP BY cell
),
merged AS (
  SELECT c.cell, c.n AS n_base, COALESCE(i.n_inc, 0) AS n_incoming,
         {_UPS_MERGED}, {_UPS_OLD}
  FROM cent2 c LEFT JOIN isum i USING (cell)
)
SELECT cell, CAST(n_base AS BIGINT) AS n_base,
       CAST(n_incoming AS BIGINT) AS n_incoming,
       CAST({_UPS_DRIFT} AS BIGINT) AS centroid_drift_sq
FROM merged ORDER BY cell
"""


def _upsert_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the BASE-subset Lloyd training (the persisted
    index an upsert maintains against)."""
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        h = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("upsert:"), F.col("vec_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % _UPS_MOD
        )
        base = emb.filter(h != 0)
        cells = S.kmeans_cells(base, n_cells=_KM_CELLS, n_iters=_KM_ITERS).persist()
        cells.count()
        return cells

    return _memo(spark, sf_dir, "upsert_cells", build)


@register("q_sim_index_upsert", oracle=_UPSERT_ORACLE)
def q_sim_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance: a deterministic ~10% of the
    corpus arrives as the incoming batch; the index (Lloyd cells
    trained on the other 90%) stays FROZEN — incoming vectors are
    assigned to the nearest existing centroid by the same map-only
    literal-argmin projection, and the report shows per cell how many
    landed there and how far the centroid WOULD move if merged
    (exact-integer squared displacement of the floor-mean). The
    operational answer to 'when do I retrain?': drift ~0 means
    assign-only upserts are safe; a hot cell with big drift is the
    retrain trigger.

    100 TB shape: the incoming batch never shuffles (literal-centroid
    assign); per-cell sums are posexplode partial aggs (cells x dim
    longs); the trained index rides a session memo exactly like the
    serving-path queries."""
    from corrie_spark.queries.dedup_queries import _memo

    cells = _upsert_cells(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("upsert:"), F.col("vec_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % _UPS_MOD
    )
    inc = emb.filter(h == 0).select(
        F.col("vec_id").alias("vid"), S.quantize(F.col("embedding")).alias("qv")
    )
    cent_rows = S._centroids_of(cells, _DIM).collect()
    iassign = S.kmeans_assign(inc, [(r["cell"], r["centroid"]) for r in cent_rows])

    def dim_sums(assigned: DataFrame, s_name: str, n_name: str) -> DataFrame:
        return (
            assigned.select("cell", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum("x").alias(s_name),
                F.count(F.lit(1)).cast("bigint").alias(n_name),
            )
        )

    b = dim_sums(cells, "s", "nb")
    i = dim_sums(iassign, "t", "ni")
    per_dim = (
        b.join(i, ["cell", "pos"], "left")
        .select(
            "cell",
            "pos",
            "nb",
            F.coalesce("ni", F.lit(0)).alias("ni"),
            F.floor(F.col("s") / F.col("nb")).cast("bigint").alias("old_c"),
            F.floor(
                (F.col("s") + F.coalesce(F.col("t"), F.lit(0)))
                / (F.col("nb") + F.coalesce(F.col("ni"), F.lit(0)))
            )
            .cast("bigint")
            .alias("new_c"),
        )
    )
    d = (F.col("new_c") - F.col("old_c"))
    return (
        per_dim.groupBy("cell")
        .agg(
            F.first("nb").cast("bigint").alias("n_base"),
            F.first("ni").cast("bigint").alias("n_incoming"),
            F.sum(d * d).cast("bigint").alias("centroid_drift_sq"),
        )
        .orderBy("cell")
    )


# --- Matryoshka cascade: prefix-dim candidates -> full-dim re-rank ---------

_CASCADE_C = 50  # candidate beam from the prefix stage

_CASCADE_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
exact_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
exact_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM exact_s
),
truth AS (SELECT query_id, neighbor_id FROM exact_r WHERE rnk <= 10),
pre_s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_MAT_DIM + 1}), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
pre_r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM pre_s
),
beam AS (SELECT query_id, neighbor_id FROM pre_r WHERE rnk <= {_CASCADE_C}),
rerank AS (
  SELECT e.query_id, e.neighbor_id, e.dot,
         ROW_NUMBER() OVER (PARTITION BY e.query_id ORDER BY e.dot DESC, e.neighbor_id) AS rnk
  FROM exact_s e JOIN beam USING (query_id, neighbor_id)
),
approx AS (SELECT query_id, neighbor_id FROM rerank WHERE rnk <= 10)
SELECT t.query_id,
       COUNT(*) AS k_truth,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_10
FROM truth t
LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY t.query_id
ORDER BY t.query_id
"""


@register("q_sim_matryoshka_cascade", oracle=_CASCADE_ORACLE, python_stages="two partial-top-k stages (beam + re-rank)")
def q_sim_matryoshka_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Matryoshka serving cascade: generate a {C}-candidate beam
    with the FIRST {16} dims only (4x less memory bandwidth per
    comparison — at scale this stage reads a truncated column), then
    re-rank the beam with full-dim exact dots fetched by an id-keyed
    join. recall@10 vs brute-force truth — the cascade must recover
    most of what prefix-only top-10 loses (pinned >= prefix recall by
    test). Both stages are bounded partial top-k; the full-dim
    vectors are touched for C rows per query, never the corpus."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = _bf_truth(spark, sf_dir).select("query_id", "neighbor_id")

    qv = q.select(
        F.col("vec_id").alias("query_id"), S.quantize(F.col("embedding")).alias("q_vec")
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"), S.quantize(F.col("embedding")).alias("c_vec")
    )
    prefix_dot = F.expr(
        f"aggregate(zip_with(slice(q_vec, 1, {_MAT_DIM}), slice(c_vec, 1, {_MAT_DIM}),"
        " (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
    )
    scored_pre = (
        cv.crossJoin(F.broadcast(qv))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", prefix_dot.alias("dot"), "q_vec", "c_vec")
    )
    beam = S.grouped_topk(scored_pre, _CASCADE_C, carry=("q_vec", "c_vec"))
    full_dot = F.expr(
        "aggregate(zip_with(q_vec, c_vec, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
    )
    rerank = beam.select("query_id", "neighbor_id", full_dot.alias("dot"))
    approx = S.grouped_topk(rerank, 10).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return (
        truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k_truth"),
            F.sum(hit).cast("bigint").alias("k_hit"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# --- embedding isotropy / collapse diagnostic ------------------------------

_ISO_SCORE = (
    "((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
    " / (CAST(b AS DOUBLE) / CAST(n AS DOUBLE))"
)

_ISOTROPY_ORACLE = f"""
WITH base AS (
  SELECT d.source, {_QUANT} AS qv
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
dsums AS (
  SELECT source, g.d, CAST(SUM(qv[g.d + 1]) AS BIGINT) AS s
  FROM base CROSS JOIN range(0, {_DIM}) g(d)
  GROUP BY source, g.d
),
persrc AS (
  SELECT source, CAST(SUM(s * s) AS BIGINT) AS a FROM dsums GROUP BY source
),
norms AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> qv[i] * qv[i])) AS BIGINT)) AS BIGINT) AS b
  FROM base GROUP BY source
)
SELECT p.source, n AS n_vectors,
       CAST(b AS DOUBLE) / CAST(n AS DOUBLE) AS avg_norm_sq,
       {_ISO_SCORE} AS collapse_score
FROM persrc p JOIN norms USING (source)
ORDER BY p.source
"""


@register("q_emb_isotropy", oracle=_ISOTROPY_ORACLE)
def q_emb_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-collapse diagnostic per source: mean pairwise cosine
    proxy = ((||Σv||² − Σ||v||²) / n(n−1)) / mean||v||² — near 0 for
    an isotropic (healthy) embedding cloud, near 1 when vectors
    collapse to one direction (a dying encoder, or a source whose
    texts are near-identical). The identity turns ALL pairwise dots
    into two exact-integer corpus sums: per-dim sums (posexplode
    partial agg, #sources x dim longs) and per-vector norms (map +
    sum) — never an O(n²) pair pass. Exact ints up to ~10^9 vectors
    per source at this quantization (per-dim sums square into int64);
    beyond that the same sums go through DECIMAL — the SSE-sum
    lesson."""
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    base = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source", S.quantize(F.col("embedding")).alias("qv")
    )
    dsums = (
        base.select("source", F.posexplode("qv").alias("d", "x"))
        .groupBy("source", "d")
        .agg(F.sum("x").alias("s"))
    )
    persrc = dsums.groupBy("source").agg(
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("a")
    )
    vnorm = F.expr(
        "aggregate(zip_with(qv, qv, (p, q) -> p * q), 0L, (acc, x) -> acc + x)"
    )
    norms = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vnorm).cast("bigint").alias("b"),
    )
    return (
        persrc.join(norms, "source")
        .select(
            "source",
            F.col("n").alias("n_vectors"),
            (F.col("b").cast("double") / F.col("n").cast("double")).alias(
                "avg_norm_sq"
            ),
            F.expr(_ISO_SCORE).alias("collapse_score"),
        )
        .orderBy("source")
    )


# --- index distortion report: ADC error vs exact dots ----------------------

import re as _re

_SQ8_CTES_RENAMED = _re.sub(r"\benc\b", "senc", _re.sub(r"\bq\b", "sq", _SQ8_CTES))

_DISTORTION_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
{_PQ_CTES.lstrip()},
{_SQ8_CTES_RENAMED.lstrip()},
exact_s AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> q.qv[i] * b.qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN (SELECT vec_id, qv FROM base WHERE vec_id < 5) q
  WHERE b.vec_id <> q.vec_id
),
err_pq AS (
  SELECT 'pq' AS method, p.query_id,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(ABS(p.approx_dot - e.dot)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_abs_err,
         CAST(MAX(ABS(p.approx_dot - e.dot)) AS BIGINT) AS max_abs_err
  FROM pq_score p JOIN exact_s e USING (query_id, neighbor_id)
  GROUP BY p.query_id
),
err_sq8 AS (
  SELECT 'sq8' AS method, s.query_id,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(ABS(s.approx_dot - e.dot)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_abs_err,
         CAST(MAX(ABS(s.approx_dot - e.dot)) AS BIGINT) AS max_abs_err
  FROM sq8_s s JOIN exact_s e USING (query_id, neighbor_id)
  GROUP BY s.query_id
)
SELECT * FROM err_pq UNION ALL SELECT * FROM err_sq8
ORDER BY method, query_id
"""


@register("q_sim_distortion", oracle=_DISTORTION_ORACLE)
def q_sim_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-distortion report: mean/max |ADC score − exact
    dot| over every (bench query, corpus vector) pair, for PQ (64x
    compression) and SQ8 (8x) side by side — the error numbers BEHIND
    the recall queries (recall says whether top-10 survives; this
    says how much score fidelity each compression level spends, which
    predicts how recall will degrade as k or corpus density changes).
    Exact-integer errors, one broadcast pass per method over the
    persisted codes frames; both index memos shared with the serving
    queries; oracle replays both quantizers and the exact dots."""
    from corrie_spark.operators import pq as PQ

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        S.quantize(F.col("embedding")).alias("c_vec"),
    )
    exact = F.expr(
        "aggregate(zip_with(q_vec, c_vec, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
    )

    def report(scored: DataFrame, method: str) -> DataFrame:
        err = F.abs(F.col("approx_dot") - F.col("exact_dot"))
        return (
            scored.groupBy("query_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                (
                    F.sum(err).cast("double") / F.count(F.lit(1)).cast("double")
                ).alias("mean_abs_err"),
                F.max(err).cast("bigint").alias("max_abs_err"),
            )
            .select(
                F.lit(method).alias("method"),
                "query_id",
                "n_pairs",
                "mean_abs_err",
                "max_abs_err",
            )
        )

    # PQ: ADC via the session index memo's LUT scoring
    books, codes = _pq_index(spark, sf_dir)
    qlut = q.select(
        F.col("vec_id").alias("query_id"), S.quantize(F.col("embedding")).alias("q_vec")
    ).select("query_id", "q_vec", PQ._lut(F.col("q_vec"), books, PQ.SUB_DIM, PQ.N_CODES).alias("lut"))
    adc = F.expr(
        "aggregate(zip_with(lut, codes, (l, c) -> element_at(l, c + 1)),"
        " 0L, (acc, x) -> acc + x)"
    )
    pq_scored = (
        codes.withColumnRenamed("vid", "neighbor_id")
        .join(cv, "neighbor_id")
        .crossJoin(F.broadcast(qlut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", adc.alias("approx_dot"), exact.alias("exact_dot"))
    )

    # SQ8: midpoint-reconstruction ADC via the session bounds/codes memo
    bounds, scodes = _sq8_index(spark, sf_dir)
    mins, spans = PQ._sq8_arrays(bounds)
    sq8_score = (
        "aggregate(transform(codes, (c, d) -> element_at(q_vec, d+1) *"
        f" (element_at({mins}, d+1) + ((2*c + 1) * element_at({spans}, d+1)) div 512L)),"
        " 0L, (acc, x) -> acc + x)"
    )
    qv = q.select(
        F.col("vec_id").alias("query_id"), S.quantize(F.col("embedding")).alias("q_vec")
    )
    sq8_scored = (
        scodes.withColumnRenamed("vid", "neighbor_id")
        .join(cv, "neighbor_id")
        .crossJoin(F.broadcast(qv))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", F.expr(sq8_score).alias("approx_dot"), exact.alias("exact_dot")
        )
    )
    return (
        report(pq_scored, "pq")
        .unionAll(report(sq8_scored, "sq8"))
        .orderBy("method", "query_id")
    )
