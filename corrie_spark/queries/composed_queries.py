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


@register("q_sim_hard_negatives", oracle=_hardneg_oracle(), python_stages="partial-top-k consumer (cluster-excluded)")
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
    from corrie_spark.operators.similarity import grouped_topk, int_dot, quantize
    from corrie_spark.queries.dedup_queries import _shared_clusters

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


# --- duplication x quality interaction -------------------------------------

def _dupq_oracle() -> str:
    from corrie_spark.operators import dedup as D
    from corrie_spark.queries.dedup_queries import _CLUSTERS_ORACLE, _sig_expr
    from corrie_spark.queries.text_queries import _NSTOP, _NTOK, _TOKS

    clusters = _CLUSTERS_ORACLE.format(
        toks=_TOKS,
        sig_list=", ".join(_sig_expr(i) for i in range(D.DEFAULT_NUM_HASHES)),
    )
    tail = "SELECT node AS doc_id, MIN(r) AS cluster_id\nFROM reach GROUP BY node"
    assert tail in clusters
    return clusters.replace(
        tail,
        f""", clus AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
csize AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n FROM clus GROUP BY cluster_id),
feat AS (
  SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens, CAST({_NSTOP} AS BIGINT) AS n_stop
  FROM documents
),
bucketed AS (
  SELECT CASE WHEN cs.n = 1 THEN 'unique'
              WHEN cs.n <= 3 THEN 'small_2_3'
              ELSE 'large_4_plus' END AS size_bucket,
         c.cluster_id, f.n_tokens, f.n_stop
  FROM clus c JOIN csize cs USING (cluster_id) JOIN feat f USING (doc_id)
)
SELECT size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
       CAST(SUM(n_stop) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE) AS stopword_ratio
FROM bucketed GROUP BY size_bucket ORDER BY size_bucket""",
    )


@register("q_dedup_quality_interaction", oracle=_dupq_oracle())
def q_dedup_quality_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does duplication correlate with junk? Per near-dup-cluster-size
    bucket (unique / 2-3 copies / 4+): doc counts, cluster counts and
    exact-ratio quality signals (mean tokens, stopword ratio) — the
    evidence behind 'dedup improves data quality' for THIS corpus,
    with the dedup subsystem and the text-feature subsystem proven
    against one oracle simultaneously.

    100 TB shape: cluster sizes are a metadata-sized rollup of the
    session cluster memo; the feature pass is map-only; the size
    re-join is id-keyed; all means are double ratios of exact int64
    sums (order-independent)."""
    from corrie_spark.operators import text as T
    from corrie_spark.queries.dedup_queries import _shared_clusters

    docs = load(spark, sf_dir, "documents")
    clus = _shared_clusters(spark, sf_dir)
    csize = clus.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # round-14: one tokenization for both counts (token_stop_counts
    # binds the token array; the two operators each re-split before)
    feat = docs.select(
        "doc_id", T.token_stop_counts("text").alias("_c")
    ).select("doc_id", "_c.*")
    bucket = (
        F.when(F.col("n") == 1, "unique")
        .when(F.col("n") <= 3, "small_2_3")
        .otherwise("large_4_plus")
    )
    bucketed = (
        clus.join(csize, "cluster_id")
        .join(feat, "doc_id")
        .select(bucket.alias("size_bucket"), "cluster_id", "n_tokens", "n_stop")
    )
    return (
        bucketed.groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
                "mean_tokens"
            ),
            (F.sum("n_stop").cast("double") / F.sum("n_tokens").cast("double")).alias(
                "stopword_ratio"
            ),
        )
        .orderBy("size_bucket")
    )


# --- dedup-aware retrieval: BM25 over cluster representatives --------------

def _bm25_dedup_oracle() -> str:
    from corrie_spark.operators import dedup as D
    from corrie_spark.queries.dedup_queries import _CLUSTERS_ORACLE, _sig_expr
    from corrie_spark.queries.text_queries import (
        _BM25_NMATCH,
        _BM25_SCORE,
        _BM25_TERM_COLS,
        _BM25_TERMS_SQL,
        _BM25_TOTAL,
        _TOKS,
    )

    clusters = _CLUSTERS_ORACLE.format(
        toks=_TOKS,
        sig_list=", ".join(_sig_expr(i) for i in range(D.DEFAULT_NUM_HASHES)),
    )
    tail = "SELECT node AS doc_id, MIN(r) AS cluster_id\nFROM reach GROUP BY node"
    assert tail in clusters
    return clusters.replace(
        tail,
        f""", clus AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
csize AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM clus GROUP BY cluster_id),
reps AS (SELECT doc_id FROM clus WHERE doc_id = cluster_id),
bm_base AS (
  SELECT d.doc_id, list_filter(string_split_regex(d.text, '\\s+'), t -> length(t) > 0) AS btoks
  FROM documents d JOIN reps USING (doc_id)
),
dls AS (SELECT doc_id, CAST(len(btoks) AS BIGINT) AS dl, btoks FROM bm_base),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dls
),
postings AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, UNNEST(btoks) AS term FROM dls)
  WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, dl, term
),
dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term),
bscored AS (
  SELECT doc_id, term, {_BM25_SCORE} AS s
  FROM postings JOIN dfs USING (term) CROSS JOIN stats
),
bper_doc AS (
  SELECT doc_id, {_BM25_TERM_COLS} FROM bscored GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, {_BM25_TOTAL} AS bm25, CAST({_BM25_NMATCH} AS BIGINT) AS n_matched
  FROM bper_doc ORDER BY bm25 DESC, doc_id LIMIT 10
)
SELECT r.doc_id, r.bm25, r.n_matched, c.cluster_size
FROM ranked r JOIN csize c ON c.cluster_id = r.doc_id
ORDER BY r.bm25 DESC, r.doc_id""",
    )


@register("q_text_bm25_dedup", oracle=_bm25_dedup_oracle())
def q_text_bm25_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware retrieval — the third cross-subsystem composition
    proof: BM25 ranks ONLY near-dup cluster representatives (standard
    practice before indexing a crawl: duplicates otherwise crowd the
    result list with the same content), and each hit reports its
    cluster size — how many copies that single result now stands for.
    The LSH/CC cluster map and the BM25 engine (two independently
    oracle-checked subsystems) must compose exactly: the oracle
    replays signatures -> band join -> recursive closure ->
    representative filter -> the full BM25 pipeline in one statement.

    Scale shape: representative filter is an id-keyed semi join
    against the (metadata-sized relative to the corpus) cluster map;
    BM25 keeps its two-scan zero-join plan over the filtered corpus;
    cluster sizes join the 10-row result."""
    from corrie_spark.queries.dedup_queries import _shared_clusters
    from corrie_spark.queries.text_queries import bm25_rank

    clus = _shared_clusters(spark, sf_dir)
    reps = clus.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    csize = clus.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    docs = load(spark, sf_dir, "documents").join(reps, "doc_id")
    ranked = bm25_rank(docs, k=10)
    return (
        ranked.join(csize, ranked.doc_id == csize.cluster_id)
        .select(ranked.doc_id, "bm25", "n_matched", "cluster_size")
        .orderBy(F.col("bm25").desc(), "doc_id")
    )


# --- image-text pair quality: the FOURTH cross-subsystem composition -------

def _mm_text_quality_oracle() -> str:
    from corrie_spark.queries.multimodal_queries import _DHASH_CLUSTERS_ORACLE
    from corrie_spark.queries.text_queries import _NORM, _NSTOP, _NTOK

    tail = """SELECT l.cluster_id,
       CAST(SUM(g.n) AS BIGINT) AS n_members,
       MIN(g.rep) AS keep_id
FROM grp g JOIN labels l USING (rep)
GROUP BY l.cluster_id HAVING SUM(g.n) > 1
ORDER BY l.cluster_id"""
    assert tail in _DHASH_CLUSTERS_ORACLE
    return _DHASH_CLUSTERS_ORACLE.replace(
        tail,
        f""", img AS (
  SELECT h.media_id AS doc_id, l.cluster_id
  FROM hs h JOIN grp g ON h.dhash = g.dhash JOIN labels l USING (rep)
),
csize AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n FROM img GROUP BY cluster_id
),
feat AS (
  SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens,
         CAST({_NSTOP} AS BIGINT) AS n_stop
  FROM documents
),
copies AS (
  SELECT doc_id,
         CAST(COUNT(*) OVER (PARTITION BY md5({_NORM})) AS BIGINT) AS n_copies
  FROM documents
),
bucketed AS (
  SELECT CASE WHEN cs.n = 1 THEN 'unique'
              WHEN cs.n <= 3 THEN 'small_2_3'
              ELSE 'large_4_plus' END AS size_bucket,
         i.cluster_id, f.n_tokens, f.n_stop, c.n_copies
  FROM img i JOIN csize cs USING (cluster_id)
  JOIN feat f USING (doc_id) JOIN copies c USING (doc_id)
)
SELECT size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
       CAST(SUM(n_stop) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE) AS stopword_ratio,
       CAST(SUM(n_copies) AS DOUBLE) / COUNT(*) AS mean_text_copies,
       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_text_dup_docs
FROM bucketed GROUP BY size_bucket ORDER BY size_bucket""",
    )


@register("q_multimodal_text_quality", oracle=_mm_text_quality_oracle(), python_stages="rides the dhash-cluster memo (Arrow decode)")
def q_multimodal_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair quality — the FOURTH cross-subsystem
    composition proof (round-7 verdict #7): per IMAGE-dedup-cluster
    size bucket (perceptual dHash clusters over the media corpus),
    the paired documents' text quality (mean tokens, stopword ratio)
    and text EXACT-dedup signals (mean copies per normalized-text
    fingerprint, count of duplicated docs) — the report a multimodal
    pipeline uses to decide whether repeated images mark repeated/
    boilerplate text. Three independently oracle-checked subsystems
    (perceptual image dedup, text features, exact text dedup) must
    compose exactly in one statement.

    100 TB shape: the image cluster map is the session memo (8-byte
    hashes, pixels never shuffle); joins are id-/hash-keyed long-only
    shuffles; cluster sizes and text-copy counts are COUNT(*) OVER
    window sums on the already-partitioned key (one pass — a groupBy
    re-join here re-executes the Arrow/md5 subtree a second time);
    every reported mean is a double ratio of exact int64 sums."""
    from corrie_spark.operators import dedup as D
    from corrie_spark.operators import multimodal as M
    from corrie_spark.operators import text as T
    from corrie_spark.queries.multimodal_queries import _dhash_cluster_labels

    docs = load(spark, sf_dir, "documents")
    hashes = M.image_dhash(M.synth_media(docs.select("doc_id"))).filter(
        F.col("dhash").isNotNull()
    )
    labels = _dhash_cluster_labels(spark, sf_dir).select("dhash", "cluster_id")
    img = (
        hashes.select(F.col("media_id").alias("doc_id"), "dhash")
        .join(labels, "dhash")
        .select("doc_id", "cluster_id")
    )
    # round-14: cluster sizes and text-copy counts are COUNT(*) OVER
    # window sums instead of groupBy+self-join — the self-joins made
    # Catalyst re-execute the dhash Arrow stage (csize side) and the
    # md5 fingerprint scan (copies side) a second time each; the
    # window states the identical count with the subtree run ONCE
    # (the oracle's copies CTE is already written as COUNT(*) OVER).
    from pyspark.sql import Window

    img_n = img.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).cast("bigint")
    )
    # round-14: one tokenization for both counts (token_stop_counts
    # binds the token array; the two operators each re-split before)
    feat = docs.select(
        "doc_id", T.token_stop_counts("text").alias("_c")
    ).select("doc_id", "_c.*")
    copies = (
        docs.select("doc_id", D.fingerprint("text").alias("fp"))
        .withColumn(
            "n_copies",
            F.count(F.lit(1)).over(Window.partitionBy("fp")).cast("bigint"),
        )
        .select("doc_id", "n_copies")
    )
    bucket = (
        F.when(F.col("n") == 1, "unique")
        .when(F.col("n") <= 3, "small_2_3")
        .otherwise("large_4_plus")
    )
    bucketed = (
        img_n.join(feat, "doc_id")
        .join(copies, "doc_id")
        .select(bucket.alias("size_bucket"), "cluster_id", "n_tokens", "n_stop", "n_copies")
    )
    return (
        bucketed.groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
            (F.sum("n_stop").cast("double") / F.sum("n_tokens").cast("double")).alias(
                "stopword_ratio"
            ),
            (F.sum("n_copies").cast("double") / F.count(F.lit(1))).alias(
                "mean_text_copies"
            ),
            F.sum((F.col("n_copies") > 1).cast("int")).cast("bigint").alias(
                "n_text_dup_docs"
            ),
        )
        .orderBy("size_bucket")
    )


# --- mixed-format crawl -> unified corpus ------------------------------------

# what a real crawl ingest actually faces: ONE archive stream carrying
# HTML pages, PDFs and Office documents, routed by Content-Type into
# format-specific extractors and landing in one documents-shaped frame.


def _mixed_oracle() -> str:
    from corrie_spark.operators import web as Wb
    from corrie_spark.sources import pdf as P

    html_chain = Wb.html_to_text_sql(Wb.FIXTURE_PAGE_TMPL.format(S="VARCHAR"))
    wpl = P.WORDS_PER_LINE
    return f"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
lns AS (
  SELECT doc_id, text,
    CASE WHEN len(t) = 0 THEN []
         ELSE list_transform(
           range(0, (len(t) + {wpl - 1}) // {wpl}),
           i -> array_to_string(
             list_slice(t, i * {wpl} + 1, i * {wpl} + {wpl}), ' '))
    END AS ls
  FROM toks
)
SELECT doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'html' WHEN 1 THEN 'pdf' ELSE 'docx' END AS fmt,
  CASE WHEN doc_id % 3 = 0 THEN md5({html_chain})
       ELSE md5(COALESCE(array_to_string(ls, chr(10)), '')) END AS text_md5
FROM lns
"""


def _shared_mixed_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format crawl fixture (payload column KEPT — the binary
    bodies are the point) -> real WARC reader, memoized."""
    import gzip

    import pandas as pd

    from corrie_spark.operators.web import fixture_page
    from corrie_spark.sources import ooxml as O
    from corrie_spark.sources import pdf as P
    from corrie_spark.sources import warc as Wc

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")

        def mk(key, pdf):
            grp = int(key[0])
            members = [Wc.warcinfo_record(f"mx-{grp:05d}.warc.gz")]
            for did, text in sorted(zip(pdf["doc_id"], pdf["text"])):
                did, text = int(did), str(text)
                target = f"https://example.org/doc/{did}"
                if did % 3 == 0:
                    body = fixture_page(did, text).encode("utf-8")
                    ctype = "text/html; charset=utf-8"
                elif did % 3 == 1:
                    body = P.build_pdf(did, text)
                    ctype = "application/pdf"
                else:
                    body = O.build_docx(did, text)
                    ctype = (
                        "application/vnd.openxmlformats-officedocument"
                        ".wordprocessingml.document"
                    )
                members.append(
                    Wc.binary_response_record(
                        f"mixed:{did}", target, body, ctype
                    )
                )
            blob = b"".join(
                gzip.compress(m, compresslevel=1) for m in members
            )
            return pd.DataFrame(
                [{"path": f"mx-{grp:05d}.warc.gz", "content": blob}]
            )

        files = (
            docs.withColumn("_grp", F.col("doc_id") % 8)
            # keep the tiny fixture shuffle parallel under AQE
            .repartition(docs.sparkSession.sparkContext.defaultParallelism, "_grp")
            .groupBy("_grp")
            .applyInPandas(mk, "path string, content binary")
        )
        recs = Wc.warc_records(files).persist()
        recs.count()
        return recs

    from corrie_spark.queries.dedup_queries import _memo

    return _memo(spark, sf_dir, "mixed_crawl_records", build)


@register("q_warc_mixed_formats", oracle=_mixed_oracle(), python_stages="WARC ingest + PDF + OOXML Arrow stages")
def q_warc_mixed_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real crawl-ingest shape, END-TO-END: one WARC stream whose
    responses carry HTML pages, real PDFs and real DOCX containers
    behind their Content-Types; the pipeline routes by type — HTML
    through the JVM strip chain, application/pdf payloads through the
    from-spec PDF reader (pages re-joined in page order), the OOXML
    type through the ZIP/WordprocessingML reader — and lands all three
    in one (doc_id, fmt, text_md5) frame. FOUR oracle-checked
    subsystems compose in one gated statement (WARC framing + three
    extractors); the oracle replays each format's expected text
    closed-form. Scale: each branch is a row-local Arrow stage over
    the SAME ingested memo; payload bytes reach exactly the branch
    that needs them and never shuffle (the pdf page re-join shuffles
    page TEXT, grouped per source file)."""
    from corrie_spark.operators import web as Wb
    from corrie_spark.sources import ooxml as O
    from corrie_spark.sources import pdf as P

    recs = _shared_mixed_crawl(spark, sf_dir).where(
        F.col("warc_type") == "response"
    )
    did = (
        F.regexp_extract("target_uri", r"/doc/([0-9]+)$", 1)
        .cast("long")
        .alias("doc_id")
    )
    html = recs.where(F.col("http_content_type").startswith("text/html")).select(
        did,
        F.lit("html").alias("fmt"),
        F.md5(Wb.html_to_text(F.col("text"))).alias("text_md5"),
    )
    pdf_pages = P.pdf_records(
        recs.where(F.col("http_content_type") == "application/pdf").select(
            F.col("target_uri").alias("path"),
            F.col("payload").alias("content"),
        ),
        file_col="path",
        content_col="content",
    )
    pdf = (
        pdf_pages.where(F.col("error").isNull())
        .groupBy("pdf_file")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("page", "text"))),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("_t")
        )
        .select(
            F.regexp_extract("pdf_file", r"/doc/([0-9]+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.lit("pdf").alias("fmt"),
            F.md5("_t").alias("text_md5"),
        )
    )
    docx = O.office_records(
        recs.where(
            F.col("http_content_type").contains("wordprocessingml")
        ).select(
            F.col("target_uri").alias("path"),
            F.col("payload").alias("content"),
        )
    )
    docx = docx.where(F.col("error").isNull()).select(
        F.regexp_extract("office_file", r"/doc/([0-9]+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.lit("docx").alias("fmt"),
        F.md5("text").alias("text_md5"),
    )
    return html.unionByName(pdf).unionByName(docx)
