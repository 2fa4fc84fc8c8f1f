"""Composed cross-subsystem queries: each one chains TWO of the
engine's subsystems (embedding similarity x text dedup, ...) so the
oracle must agree with both simultaneously — composition proofs like
q_corpus_manifest, at query scale. Registered last so it can import
fragments from every other query module."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.queries.registry import register
from corrie_spark.queries.similarity_queries import _DIM, _QUANT
from corrie_spark.tables import load


# --- hard-negative mining: nearest neighbors OUTSIDE the dedup cluster -----

def _hardneg_oracle() -> str:
    from corrie_spark.operators import dedup as D
    from corrie_spark.queries.dedup_queries import _CLUSTERS_ORACLE, _sig_expr
    from corrie_spark.queries.text_queries import _TOKS

    clusters = _CLUSTERS_ORACLE.format(
        toks=_TOKS,
        sig_list=", ".join(_sig_expr(i) for i in range(D.DEFAULT_NUM_HASHES)),
    )
    tail = "SELECT node AS doc_id, MIN(r) AS cluster_id\nFROM reach GROUP BY node"
    assert tail in clusters
    return clusters.replace(
        tail,
        f""", clus AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
base AS (SELECT vec_id, {_QUANT} AS qv FROM embeddings),
q AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id < 5),
s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {_DIM + 1}), i -> q_vec[i] * qv[i])) AS BIGINT) AS dot
  FROM base b CROSS JOIN q WHERE b.vec_id <> query_id
),
excl AS (
  SELECT s.query_id, s.neighbor_id, s.dot
  FROM s
  JOIN clus cq ON cq.doc_id = s.query_id
  JOIN clus cn ON cn.doc_id = s.neighbor_id
  WHERE cq.cluster_id <> cn.cluster_id
),
r AS (
  SELECT query_id, neighbor_id, dot,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM excl
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, dot
FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",
    )


@register("q_sim_hard_negatives", oracle=_hardneg_oracle())
def q_sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: each query's
    top-10 most-similar vectors EXCLUDING anything in the query's own
    text near-dup cluster — similar-but-not-duplicate is exactly what
    a contrastive objective wants as negatives, and excluding
    near-dups prevents false negatives (the classic in-batch
    contamination bug). A composition proof across two subsystems:
    the embedding scorer and the MinHash-LSH/CC cluster map must
    agree with the oracle SIMULTANEOUSLY.

    100 TB shape: broadcast query set over one corpus scan (as the
    exact baseline), cluster map joins are id-keyed (the 5-row query
    side's clusters broadcast); partial top-k bounds the only
    exchange at ~#queries x k rows per partition. Rides the session
    cluster memo — the LSH/CC build is shared with the whole dedup
    family."""
    from pyspark.sql.window import Window

    from corrie_spark.queries.dedup_queries import _shared_clusters

    from corrie_spark.operators.similarity import grouped_topk, int_dot, quantize

    emb = load(spark, sf_dir, "embeddings")
    clus = _shared_clusters(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    # score with exclusion BEFORE the top-k bound: build the scored
    # frame the same way brute_force_topk does, then anti-filter on
    # cluster equality, then partial top-k

    qf = q.select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("q_vec")
    )
    cf = emb.select(
        F.col("vec_id").alias("neighbor_id"), quantize(F.col("embedding")).alias("c_vec")
    )
    cq = clus.select(
        F.col("doc_id").alias("query_id"), F.col("cluster_id").alias("q_cluster")
    )
    cn = clus.select(
        F.col("doc_id").alias("neighbor_id"), F.col("cluster_id").alias("n_cluster")
    )
    pairs = (
        cf.join(cn, "neighbor_id")
        .crossJoin(F.broadcast(qf.join(cq, "query_id")))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("q_cluster") != F.col("n_cluster"))
        )
        .select(
            "query_id",
            "neighbor_id",
            int_dot(F.col("q_vec"), F.col("c_vec")).alias("dot"),
        )
    )
    return (
        grouped_topk(pairs, 10)
        .select("query_id", "neighbor_id", F.col("rnk").cast("bigint"), "dot")
        .orderBy("query_id", "rnk")
    )
