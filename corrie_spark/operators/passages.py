"""Duplicated-passage detection: exact substring-level dedup signals.

The document-level dedup family (operators/dedup.py) answers "which
DOCUMENTS are near-copies"; this operator answers the finer question
from Lee et al., "Deduplicating Training Data Makes Language Models
Better" (2022): which PASSAGES inside documents are repeated across
the corpus, and how much of each document is covered by repeated
text. Training pipelines use this to drop or down-weight boilerplate
(headers, licenses, templated spans) that survives doc-level dedup
because the surrounding text differs.

Simplification vs the paper: the paper builds a corpus-wide suffix
array to find *maximal* repeated substrings; a suffix array is a
global sorted structure that fights Spark's partitioned model. The
standard scalable relaxation (used by most open-data pipelines) is
fixed-length token n-gram matching: a passage is "duplicated" when
one of its n-grams occurs in >= min_docs distinct documents. Runs of
overlapping duplicated n-grams then merge into spans, which for
n-gram length n lower-bounds the maximal-repeat answer at
granularity n.

Scale shape (100 TB):
  - n-gram explosion is a pure map stage: tokens -> positions ->
    (doc_id, pos, gram_hash). ~1 output row per token; each row is
    two longs + the hash (the gram STRING is dropped before any
    shuffle unless the caller asks for display text).
  - duplicated-gram detection is a two-stage aggregation:
    groupBy(gram_hash, doc_id) partial-counts map-side, then
    groupBy(gram_hash) counts distinct docs WITHOUT a distinct-agg
    hash set per group — the classic count-distinct-via-two-groupBys
    that bounds per-group state at 100 TB.
  - the occurrence->duplicated-gram join is an equi-join on
    gram_hash, co-partitioned with the aggregation above (AQE reuses
    the exchange), carrying only long columns.
  - span merging is per-document: one groupBy(doc_id) with a
    sort_array(collect_list(pos)) whose size is bounded by the doc's
    token count — never a corpus-wide sort. All span math is
    JVM-side higher-order functions (transform/filter/aggregate),
    zero Python.

Hashing: hash60 (md5-derived, salt "g") so the DuckDB oracle
reproduces gram keys bit-for-bit; see operators/dedup.hash60.

Reference parity note: the reference engine (kak-tus/corrie) has no
text operators at all — this is beyond-parity surface for the
LLM-data-pipeline mandate, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corrie_spark.functions import bind
from corrie_spark.operators.dedup import hash60
from corrie_spark.operators.text import tokens

DEFAULT_PASSAGE_N = 8


def ngram_occurrences(
    docs: DataFrame,
    n: int = DEFAULT_PASSAGE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_gram: bool = False,
) -> DataFrame:
    """One row per token n-gram occurrence: (doc_id, pos, gram_hash
    [, gram]). pos is the 1-based token index of the gram's first
    token. Docs with fewer than n tokens emit no rows (unlike
    dedup.shingles, which pads — a doc shorter than a passage cannot
    contain a duplicated passage).

    keep_gram=False (default) drops the gram string before returning,
    so downstream shuffles carry only longs — at 100 TB the string
    column is the difference between a ~3x and a ~30x shuffle. The
    top-k display query opts in.
    """
    def build(toks: Column) -> Column:
        # toks is a bound lambda variable: the tokenizer runs ONCE per
        # row — a bare column ref here would let CollapseProject inline
        # split(trim(text)) into every element_at below, re-tokenizing
        # the doc n times per gram (see functions.bind)
        return F.when(
            # guard: sequence(1, 0) would DESCEND in Spark; short docs
            # must emit an empty array instead
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.concat_ws(
                        " ",
                        *[F.element_at(toks, (i + j).cast("int")) for j in range(n)],
                    ).alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bind(tokens(text_col), build)).alias("g"),
    )
    out = grams.select(
        "doc_id",
        F.col("g.pos").alias("pos"),
        hash60(F.col("g.gram"), salt="g").alias("gram_hash"),
        F.col("g.gram").alias("gram"),
    )
    return out if keep_gram else out.drop("gram")


def duplicated_grams(
    occ: DataFrame, min_docs: int = 2, gram_col: str | None = None
) -> DataFrame:
    """Grams occurring in >= min_docs distinct documents:
    (gram_hash, n_docs, n_occ [, gram]). Two-stage aggregation — the
    inner groupBy(gram_hash, doc_id) bounds per-group state so no
    single reducer holds a distinct-set over a boilerplate gram that
    appears in 10^8 documents."""
    per_doc_aggs = [F.count(F.lit(1)).alias("occ_in_doc")]
    outer_aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("occ_in_doc").cast("bigint").alias("n_occ"),
    ]
    if gram_col:
        per_doc_aggs.append(F.min(gram_col).alias("gram"))
        outer_aggs.append(F.min("gram").alias("gram"))
    per_doc = occ.groupBy("gram_hash", "doc_id").agg(*per_doc_aggs)
    return per_doc.groupBy("gram_hash").agg(*outer_aggs).filter(
        F.col("n_docs") >= min_docs
    )


def _span_stats(ps: Column, n: int) -> list[Column]:
    """Span statistics over a SORTED position array ps for gram
    length n. Two grams at positions p < q merge into one span iff
    q <= p + n (their covered token intervals [p, p+n-1], [q, q+n-1]
    overlap or touch). All pure higher-order functions — per-row,
    no shuffle, no Python."""
    # consecutive diffs; size-1 arrays MUST short-circuit (Spark's
    # sequence(2, 1) descends instead of being empty)
    diffs = F.when(F.size(ps) <= 1, F.array().cast("array<int>")).otherwise(
        F.transform(
            F.sequence(F.lit(2), F.size(ps)),
            lambda i: (F.element_at(ps, i.cast("int")) - F.element_at(ps, (i - 1).cast("int"))).cast(
                "int"
            ),
        )
    )
    n_spans = (
        F.lit(1) + F.size(F.filter(diffs, lambda d: d > n))
    ).cast("bigint")
    covered = (
        F.lit(n)
        + F.aggregate(diffs, F.lit(0), lambda acc, d: acc + F.least(d, F.lit(n)))
    ).cast("bigint")
    return [n_spans, covered]


def dup_hits(
    docs: DataFrame,
    n: int = DEFAULT_PASSAGE_N,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos) of every duplicated-gram occurrence — the shared
    intermediate of the passage family. Callers that run several
    passage queries over one corpus persist this once (see
    passage_queries' session memo) instead of recomputing the
    explode + two-stage distinct per query."""
    occ = ngram_occurrences(docs, n=n, id_col=id_col, text_col=text_col)
    dup = duplicated_grams(occ, min_docs=min_docs).select("gram_hash")
    return occ.join(dup, "gram_hash").select("doc_id", "pos")


def dup_passage_stats(
    docs: DataFrame,
    n: int = DEFAULT_PASSAGE_N,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hits: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-passage report for docs containing at
    least one duplicated n-gram: (doc_id, n_dup_grams, n_spans,
    covered_tokens, n_tokens, dup_frac), ordered by doc_id.

    covered_tokens is the size of the union of the token intervals
    covered by duplicated grams — the quantity Lee et al. threshold
    on to drop high-boilerplate documents. dup_frac = covered /
    n_tokens as an exact double of two exact integers."""
    if hits is None:
        hits = dup_hits(docs, n=n, min_docs=min_docs, id_col=id_col, text_col=text_col)
    ps = F.sort_array(F.collect_list("pos"))
    per_doc = hits.groupBy("doc_id").agg(ps.alias("ps"))
    n_spans, covered = _span_stats(F.col("ps"), n)
    ntok = docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens(text_col)).cast("bigint").alias("n_tokens")
    )
    return (
        per_doc.select(
            "doc_id",
            F.size("ps").cast("bigint").alias("n_dup_grams"),
            n_spans.alias("n_spans"),
            covered.alias("covered_tokens"),
        )
        .join(ntok, "doc_id")
        .select(
            "doc_id",
            "n_dup_grams",
            "n_spans",
            "covered_tokens",
            "n_tokens",
            (F.col("covered_tokens").cast("double") / F.col("n_tokens")).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def top_duplicated_grams(
    docs: DataFrame,
    n: int = DEFAULT_PASSAGE_N,
    min_docs: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The k most widely duplicated n-grams (boilerplate census):
    (gram, n_docs, n_occ) with the deterministic total order
    (n_docs DESC, n_occ DESC, gram ASC). The only passage query that
    shuffles gram STRINGS — n_docs>=min_docs grams only, post-agg,
    and the final top-k is a TakeOrdered (no global sort)."""
    occ = ngram_occurrences(docs, n=n, id_col=id_col, text_col=text_col, keep_gram=True)
    dup = duplicated_grams(occ, min_docs=min_docs, gram_col="gram")
    return (
        dup.select("gram", "n_docs", "n_occ")
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("gram"))
        .limit(k)
    )


def strip_duplicated_passages(
    docs: DataFrame,
    n: int = DEFAULT_PASSAGE_N,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hits: DataFrame | None = None,
) -> DataFrame:
    """The corpus-cleaning TRANSFORM over dup_passage_stats' report:
    rebuild each document with every token covered by a duplicated
    n-gram removed (the 'drop the repeated span, keep the rest'
    policy for boilerplate). Returns ALL docs:
    (doc_id, n_tokens, n_removed, clean_text) — untouched docs pass
    through with n_removed = 0.

    Scale shape: identical to dup_passage_stats up to the per-doc
    join (long-only shuffles); the rebuild is one left join of docs
    against the per-doc covered-position arrays (bounded by token
    count) and a row-local filter-by-index — no extra shuffle beyond
    the doc-keyed join, no Python. Token membership tests use
    array_contains over the deduped covered array; its size is at
    most the doc's token count, so the row-local cost is
    O(tokens * dup_grams) worst case and O(tokens) typical.
    """
    if hits is None:
        hits = dup_hits(docs, n=n, min_docs=min_docs, id_col=id_col, text_col=text_col)
    covered = hits.groupBy("doc_id").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.collect_list("pos"),
                        lambda p: F.sequence(p, p + (n - 1)),
                    )
                )
            )
        ).alias("cov")
    )

    def rebuild(toks: Column) -> Column:
        # bound lambda var: tokenize once (functions.bind), then keep
        # tokens whose 1-based index is not in the covered set; the
        # empty guard matters because sequence(1, 0) DESCENDS in Spark
        cov0 = F.coalesce(F.col("cov"), F.array().cast("array<int>"))
        idxs = F.when(F.size(toks) == 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), F.size(toks))
        )
        kept = F.filter(idxs, lambda i: ~F.array_contains(cov0, i))
        return F.array_join(F.transform(kept, lambda i: F.element_at(toks, i)), " ")

    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    joined = base.join(covered, "doc_id", "left")
    return joined.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.coalesce(F.size("cov"), F.lit(0)).cast("bigint").alias("n_removed"),
        bind(tokens("text"), rebuild).alias("clean_text"),
    )
