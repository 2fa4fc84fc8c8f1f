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


@register("q_sim_cosine_topk", oracle=_TOPK_ORACLE)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 neighbors by (quantized) cosine for 5 query
    vectors: broadcast queries x corpus scan, window top-k. The
    brute-force baseline the ANN path is measured against."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.brute_force_topk(q, emb, k=10).select(
        "query_id", "neighbor_id", "rnk", "dot"
    )


def _plane_w(p: str, d: str) -> str:
    """DuckDB expr for the integer hyperplane weight of plane p, dim d."""
    return (
        f"(('0x' || substr(md5('plane' || {p} || ':' || CAST({d} AS VARCHAR)), 1, 8))::BIGINT"
        f" - 2147483648)"
    )


_BUCKET = (
    "CAST(list_sum(list_transform(range(0, 8), p -> "
    "CASE WHEN CAST(list_sum(list_transform(range(0, 64), d -> "
    f"qv[d + 1] * {_plane_w('p', 'd')}"
    ")) AS BIGINT) >= 0 THEN CAST(2 ** p AS BIGINT) ELSE 0 END"
    ")) AS INT)"
)

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


@register("q_sim_ann_lsh", oracle=_ANN_ORACLE)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH buckets (8 planes)
    + exact re-rank inside buckets — the 100 TB path: cost per bucket,
    not all-pairs. Bucket bits are exact integer projections, so the
    oracle reproduces them bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.ann_lsh_topk(q, emb, k=10).select("query_id", "neighbor_id", "rnk", "dot")


_DIM = 64
_NPROBE = 2
_CENT_SUMS = ", ".join(f"SUM(qv[{i + 1}]) AS s{i}" for i in range(_DIM))
_CENT_LIST = ", ".join(
    f"CAST(floor(CAST(s{i} AS DOUBLE) / n) AS BIGINT)" for i in range(_DIM)
)

_IVF_ORACLE = f"""
WITH base AS (
  SELECT vec_id, label AS cell, {_QUANT} AS qv FROM embeddings
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


@register("q_sim_ivf", oracle=_IVF_ORACLE)
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: per-cell integer centroids (floor-mean), probe
    the top-2 cells per query by centroid dot product, exact re-rank
    inside probed cells only. The inverted-file scale path: ~nprobe/
    #cells of the corpus scored per query, centroids broadcast."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(q, emb, k=10, nprobe=_NPROBE)


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
    ).withColumn("bucket", S.hyperplane_signature(F.col("q")))
    return sigs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


_RECALL_ORACLE = f"""
WITH base AS (
  SELECT vec_id, label AS cell, {_QUANT} AS qv FROM embeddings
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


@register("q_sim_ivf_recall", oracle=_RECALL_ORACLE)
def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the IVF path against brute-force ground truth, per
    query — the metric you tune nprobe against before trusting ANN at
    scale. Both sides computed in-engine; exact integer ranking makes
    the recall itself deterministic and oracle-checkable."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = S.brute_force_topk(q, emb, k=10).select("query_id", "neighbor_id")
    approx = S.ivf_topk(q, emb, k=10, nprobe=_NPROBE).select(
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
