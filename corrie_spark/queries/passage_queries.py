"""Oracle-checked duplicated-passage queries over `documents`.

Spark side: corrie_spark.operators.passages (n-gram substring-dedup
signals, Lee et al. 2022 relaxation). The DuckDB oracle re-derives
n-gram occurrences with a lateral UNNEST(range(...)) + list slice,
so positions, gram strings, span merges and coverage are compared
bit-for-bit (all-integer except the final dup_frac division, which
both engines compute as one IEEE double op over exact integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from corrie_spark.operators import passages as P
from corrie_spark.queries.registry import register
from corrie_spark.queries.text_queries import _TOKS
from corrie_spark.tables import load

_N = P.DEFAULT_PASSAGE_N  # 8-token passages
_MIN_DOCS = 2

# Shared oracle CTE chain: tokens -> n-gram occurrences -> grams in
# >= min_docs distinct docs. tk[i:i+n-1] is DuckDB's 1-based
# inclusive list slice — gram at token position i spans tokens
# [i, i+n-1], exactly ngram_occurrences' concat window.
_OCC_CTES = f"""
toks AS (
  SELECT doc_id, {_TOKS} AS tk,
         CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END AS ntok
  FROM documents
),
occ AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(tk[i:i+{_N - 1}], ' ') AS gram
  FROM toks, UNNEST(range(1, ntok - {_N} + 2)) AS u(i)
  WHERE ntok >= {_N}
),
dupg AS (
  SELECT gram,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM occ GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) >= {_MIN_DOCS}
)"""

_PASSAGE_ORACLE = f"""
WITH {_OCC_CTES},
hits AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN dupg USING (gram)
),
agg AS (
  SELECT doc_id, list_sort(list(pos)) AS ps FROM hits GROUP BY doc_id
),
spans AS (
  SELECT doc_id,
         CAST(len(ps) AS BIGINT) AS n_dup_grams,
         CAST(1 + len(list_filter(
             list_transform(range(2, len(ps) + 1), i -> ps[i] - ps[i - 1]),
             d -> d > {_N})) AS BIGINT) AS n_spans,
         CAST({_N} + COALESCE(list_sum(list_transform(
             list_transform(range(2, len(ps) + 1), i -> ps[i] - ps[i - 1]),
             d -> least(d, {_N}))), 0) AS BIGINT) AS covered_tokens
  FROM agg
)
SELECT s.doc_id, s.n_dup_grams, s.n_spans, s.covered_tokens,
       CAST(t.ntok AS BIGINT) AS n_tokens,
       CAST(s.covered_tokens AS DOUBLE) / t.ntok AS dup_frac
FROM spans s JOIN toks t USING (doc_id)
ORDER BY s.doc_id
"""


def _shared_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the duplicated-gram occurrence frame (doc_id,
    pos) — q_text_dup_passages and q_text_strip_boilerplate both ride
    it instead of re-running the explode + two-stage distinct."""
    from corrie_spark.queries.dedup_queries import _memo

    return _memo(
        spark,
        sf_dir,
        "passage_hits",
        lambda: P.dup_hits(
            load(spark, sf_dir, "documents"), n=_N, min_docs=_MIN_DOCS
        ).persist(),
    )


@register("q_text_dup_passages", oracle=_PASSAGE_ORACLE)
def q_text_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-passage coverage: for every doc
    containing an 8-gram that occurs in >= 2 distinct docs, the count
    of duplicated grams, the number of merged spans, and the fraction
    of tokens covered by repeated text — the substring-level dedup
    signal doc-level MinHash misses (boilerplate inside otherwise
    distinct documents)."""
    return P.dup_passage_stats(
        load(spark, sf_dir, "documents"),
        n=_N,
        min_docs=_MIN_DOCS,
        hits=_shared_hits(spark, sf_dir),
    )


_TOP_GRAMS_ORACLE = f"""
WITH {_OCC_CTES}
SELECT gram, n_docs, n_occ
FROM dupg
ORDER BY n_docs DESC, n_occ DESC, gram ASC
LIMIT 20
"""


@register("q_text_dup_gram_topk", oracle=_TOP_GRAMS_ORACLE)
def q_text_dup_gram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate census: the 20 most widely duplicated 8-grams by
    (distinct-doc count, occurrence count) with a deterministic
    total order — what a pipeline operator reads before writing a
    boilerplate strip rule."""
    from corrie_spark.tables import spread

    # round-14 (guide §2.5): the 8-gram explode runs pre-exchange on
    # the scan layout; spread is a no-op at real scale. A/B at sf0.1:
    # 1.2-1.5 -> 0.8-0.9 s, rows identical.
    return P.top_duplicated_grams(
        spread(load(spark, sf_dir, "documents")), n=_N, min_docs=_MIN_DOCS, k=20
    )


_STRIP_ORACLE = f"""
WITH {_OCC_CTES},
hits AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN dupg USING (gram)
),
cov AS (
  SELECT doc_id,
         list_sort(list_distinct(flatten(list(range(pos, pos + {_N}))))) AS cov
  FROM hits GROUP BY doc_id
),
rebuilt AS (
  SELECT t.doc_id,
         CAST(t.ntok AS BIGINT) AS n_tokens,
         CAST(COALESCE(len(c.cov), 0) AS BIGINT) AS n_removed,
         md5(COALESCE(array_to_string(
           list_transform(
             list_filter(range(1, t.ntok + 1),
                         i -> NOT list_contains(COALESCE(c.cov, []), i)),
             i -> t.tk[i]), ' '), '')) AS clean_md5
  FROM toks t LEFT JOIN cov c USING (doc_id)
)
SELECT doc_id, n_tokens, n_removed, clean_md5 FROM rebuilt
ORDER BY doc_id
"""


@register("q_text_strip_boilerplate", oracle=_STRIP_ORACLE)
def q_text_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning TRANSFORM for the passage family: every document
    rebuilt with duplicated-8-gram-covered tokens removed (untouched
    docs pass through, n_removed = 0). Output carries md5(clean_text)
    instead of the text so the cross-engine compare stays compact
    while still pinning the rebuilt string byte-for-byte."""
    from pyspark.sql import functions as F

    out = P.strip_duplicated_passages(
        load(spark, sf_dir, "documents"),
        n=_N,
        min_docs=_MIN_DOCS,
        hits=_shared_hits(spark, sf_dir),
    )
    return out.select(
        "doc_id", "n_tokens", "n_removed", F.md5("clean_text").alias("clean_md5")
    ).orderBy("doc_id")
