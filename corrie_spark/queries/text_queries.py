"""Oracle-checked text-analysis queries over `documents`.

Each query drives the Column-expression operators in
corrie_spark.operators.text; the oracle re-states the identical
formula in DuckDB SQL. Ratios/scores are exact double arithmetic on
integers (no rounding needed — bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.functions.core import bind
from corrie_spark.operators import text as T
from corrie_spark.queries.registry import register
from corrie_spark.tables import load

_STOP_SQL = ", ".join(f"'{w}'" for w in T.STOPWORDS)

# DuckDB fragments mirroring the operators ('g' = replace-all, which
# Spark's regexp_replace does by default)
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_NTOK = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END"
_NSTOP = (
    f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
    f"len(list_filter({_TOKS}, t -> lower(t) IN ({_STOP_SQL}))) END"
)
_NPUNCT = "length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))"
_NALPHA = "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
_NTOKCHARS = (
    f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
    f"CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS BIGINT) END"
)
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)

_STATS_ORACLE = f"""
SELECT
  doc_id,
  length(text) AS n_chars,
  {_NTOK} AS n_tokens,
  {_NSTOP} AS n_stopwords,
  {_NPUNCT} AS n_punct,
  md5({_NORM}) AS fp
FROM documents
"""


@register("q_text_stats", oracle=_STATS_ORACLE)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/stopword/punct counts + fingerprint — the
    scan-speed profiling pass of a corpus pipeline (one projection,
    zero shuffle at any scale)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.stopword_count("text").alias("n_stopwords"),
        T.punct_count("text").alias("n_punct"),
        T.fingerprint("text").alias("fp"),
    )


_QUALITY_ORACLE = f"""
WITH feat AS (
  SELECT
    doc_id,
    length(text) AS n_chars,
    {_NTOK} AS n_tokens,
    {_NTOKCHARS} AS n_token_chars,
    {_NSTOP} AS n_stop,
    {_NPUNCT} AS n_punct
  FROM documents
)
SELECT
  doc_id,
  n_tokens,
  CAST(n_token_chars AS DOUBLE) / greatest(n_tokens, 1) AS mean_token_len,
  CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
  CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
  0.4 * (CASE WHEN n_tokens >= 5
              AND CAST(n_token_chars AS DOUBLE) / greatest(n_tokens, 1) >= 2
              AND CAST(n_token_chars AS DOUBLE) / greatest(n_tokens, 1) <= 12
         THEN 1.0 ELSE 0.0 END)
  + 0.3 * least(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) * 4, 1.0)
  + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) * 5, 1.0))
    AS quality_score
FROM feat
"""


@register("q_text_quality", oracle=_QUALITY_ORACLE)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for corpus filtering (length/stopword/punct
    heuristics — the usual pre-training data quality gate)."""
    docs = load(spark, sf_dir, "documents")
    # round-14: one bound features struct projected through a select
    # boundary — the per-column field references each re-evaluated the
    # whole feature pipeline (tokenize + fold + regex) before
    row = bind(
        T.quality_features("text"),
        lambda s: F.struct(
            s["n_tokens"].alias("n_tokens"),
            s["mean_token_len"].alias("mean_token_len"),
            s["stopword_ratio"].alias("stopword_ratio"),
            s["punct_ratio"].alias("punct_ratio"),
            T.quality_score_from(s).alias("quality_score"),
        ),
    )
    return docs.select("doc_id", row.alias("_r")).select("doc_id", "_r.*")


def _lang_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in T.LANG_MARKERS[lang])
    return (
        f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
        f"len(list_filter({_TOKS}, t -> lower(t) IN ({markers}))) END"
    )


_LANG_CASE = " ".join(
    f"WHEN {lang}_hits = best THEN '{lang}'" for lang in T.LANG_MARKERS
)
_LANGID_ORACLE = f"""
WITH scores AS (
  SELECT doc_id, lang AS lang_labeled,
    {", ".join(f"{_lang_hits_sql(lang)} AS {lang}_hits" for lang in T.LANG_MARKERS)}
  FROM documents
),
best AS (
  SELECT *, greatest({", ".join(f"{lang}_hits" for lang in T.LANG_MARKERS)}) AS best
  FROM scores
)
SELECT doc_id, lang_labeled,
  CASE WHEN best < 1 THEN 'und' {_LANG_CASE} END AS lang_detected,
  en_hits
FROM best
"""


_BPE_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

_TOKENS_ORACLE = f"""
SELECT
  doc_id,
  {_NTOK} AS ws_tokens,
  len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_tokens,
  CAST(length(text) AS DOUBLE)
    / greatest(len(regexp_extract_all(text, '{_BPE_RE}')), 1) AS chars_per_token
FROM documents
"""


@register("q_text_tokens", oracle=_TOKENS_ORACLE)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace tokens and BPE-ish
    pre-tokenization (`\\w+|[^\\w\\s]` pieces) — plus chars/token, the
    standard compression-ratio proxy for corpus sizing. Pure
    projection: a 100 TB token census is one map stage."""
    docs = load(spark, sf_dir, "documents")
    bpe = F.size(T.word_tokens("text"))
    return docs.select(
        "doc_id",
        T.token_count("text").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (F.length("text").cast("double") / F.greatest(bpe, F.lit(1))).alias(
            "chars_per_token"
        ),
    )


# DuckDB mirrors of operators/text.py rolling_hash + winnow_fingerprint
_H60_MOD = f"CAST('0x' || substr(md5(':' || {{v}}), 1, 15) AS BIGINT) % {T.ROLLING_MOD}"
_ROLL = (
    f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(t, tok -> {_H60_MOD.format(v='tok')})), "
    f"(acc, h) -> (acc * {T.ROLLING_BASE} + h) % {T.ROLLING_MOD})"
)
_GRAMS5 = (
    "CASE WHEN len(t) >= 5 THEN list_transform(range(1, len(t) - 3), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]) "
    "ELSE [array_to_string(t, ' ')] END"
)
_FPRINT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, text,
    CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS t
  FROM documents
)
SELECT
  doc_id,
  {_ROLL} AS roll_hash,
  CAST(list_min(list_transform({_GRAMS5}, g -> {_H60_MOD.format(v='g')})) AS BIGINT)
    AS winnow_fp
FROM toks
"""


@register("q_text_fingerprint", oracle=_FPRINT_ORACLE)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-sensitive polynomial rolling hash
    + winnowing-style min-shingle hash (edit-robust). Both are folds
    over the row-local token array — map-stage only at 100 TB."""
    from corrie_spark.tables import spread

    # guide §2.5: both fingerprint folds are row-local and heavy; the
    # conditional spread keeps them core-parallel on a one-split scan
    # (no-op at real scale). A/B at sf0.1: 0.81 -> 0.33 s.
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.rolling_hash("text").alias("roll_hash"),
        T.winnow_fingerprint("text", k=5).alias("winnow_fp"),
    )


@register("q_text_langid", oracle=_LANGID_ORACLE)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID (n-gram heuristic): deterministic
    argmax with first-wins tie-break; emits the labeled lang alongside
    for downstream accuracy eval."""
    from corrie_spark.tables import spread

    # guide §2.5 conditional spread (no-op at real scale); A/B at
    # sf0.1: 0.58 -> 0.29 s, rows identical
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        T.detect_lang("text").alias("lang_detected"),
        T.lang_scores("text")["en"].alias("en_hits"),
    )


# shared replay of the detect_lang argmax, reused by the evaluation pair
_LANGID_PAIRS_CTE = f"""
scores AS (
  SELECT doc_id, lang AS lang_labeled,
    {", ".join(f"{_lang_hits_sql(lang)} AS {lang}_hits" for lang in T.LANG_MARKERS)}
  FROM documents
),
best AS (
  SELECT *, greatest({", ".join(f"{lang}_hits" for lang in T.LANG_MARKERS)}) AS best
  FROM scores
),
pairs AS (
  SELECT lang_labeled,
         CASE WHEN best < 1 THEN 'und' {_LANG_CASE} END AS lang_detected
  FROM best
)
"""

def _report_sql(pairs_cte: str, label: str, pred: str) -> str:
    """Classification-report SQL tail over a `pairs` CTE — the DuckDB
    twin of operators/evaluation.classification_report (confusion
    matrix -> per-class totals/diagonal -> P/R/F1 as single exact-int
    divisions). Shared by the langid and quality-classifier report
    oracles."""
    return f"""
WITH {pairs_cte},
cm AS (
  SELECT {label} AS label, {pred} AS pred, COUNT(*) AS n FROM pairs GROUP BY 1, 2
),
lab AS (SELECT label AS clazz, SUM(n) AS n_labeled FROM cm GROUP BY 1),
prd AS (SELECT pred AS clazz, SUM(n) AS n_pred FROM cm GROUP BY 1),
tp AS (SELECT label AS clazz, n AS tp FROM cm WHERE label = pred)
SELECT COALESCE(l.clazz, p.clazz) AS clazz,
  CAST(COALESCE(l.n_labeled, 0) AS BIGINT) AS n_labeled,
  CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred,
  CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
  CASE WHEN COALESCE(p.n_pred, 0) > 0
       THEN CAST(COALESCE(t.tp, 0) AS DOUBLE) / p.n_pred END AS precision,
  CASE WHEN COALESCE(l.n_labeled, 0) > 0
       THEN CAST(COALESCE(t.tp, 0) AS DOUBLE) / l.n_labeled END AS recall,
  CASE WHEN COALESCE(l.n_labeled, 0) + COALESCE(p.n_pred, 0) > 0
       THEN CAST(2 * COALESCE(t.tp, 0) AS DOUBLE)
            / (COALESCE(l.n_labeled, 0) + COALESCE(p.n_pred, 0)) END AS f1
FROM lab l
FULL OUTER JOIN prd p ON l.clazz = p.clazz
LEFT JOIN tp t ON COALESCE(l.clazz, p.clazz) = t.clazz
"""


_LANGID_CONFUSION_ORACLE = f"""
WITH {_LANGID_PAIRS_CTE}
SELECT lang_labeled AS label, lang_detected AS pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pairs GROUP BY 1, 2
"""


def _langid_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the (lang_labeled, lang_detected) pair frame —
    the detect_lang argmax over the corpus feeds BOTH evaluation
    queries (confusion matrix + classification report); one
    checkpointed materialization serves both (q_text_langid itself
    stays un-memoized: it IS the detector gate). Deterministic
    row-local argmax, memoized == inline bit-identically."""
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        return docs.select(
            F.col("lang").alias("lang_labeled"),
            T.detect_lang("text").alias("lang_detected"),
        ).localCheckpoint(eager=True)

    return _memo(spark, sf_dir, "langid_pairs", build)


@register("q_text_langid_confusion", oracle=_LANGID_CONFUSION_ORACLE)
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (labeled lang x detected lang) —
    the evaluation an operator reads before trusting the in-engine
    classifier to route a corpus. One groupBy shuffle on class keys;
    the matrix is #langs^2-bounded however large the corpus."""
    from corrie_spark.operators import evaluation as EV

    return EV.confusion_matrix(
        _langid_pairs(spark, sf_dir),
        "lang_labeled",
        "lang_detected",
    )


_LANGID_REPORT_ORACLE = _report_sql(
    _LANGID_PAIRS_CTE, "lang_labeled", "lang_detected"
)


@register("q_text_langid_report", oracle=_LANGID_REPORT_ORACLE)
def q_text_langid_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 for the language-ID classifier —
    the full classification report, derived ENTIRELY from the
    confusion matrix so the corpus shuffles once and the report joins
    touch only #langs-sized frames. Exactness: counts are exact
    BIGINTs, each ratio is one IEEE division of two ints (F1 as
    2tp/(n_pred+n_labeled), never nested P/R rounding); classes the
    detector never predicts get NULL precision, not a fake zero."""
    from corrie_spark.operators import evaluation as EV

    return EV.classification_report(
        _langid_pairs(spark, sf_dir),
        "lang_labeled",
        "lang_detected",
    )


_SHINGLE_TOPK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS t
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3 THEN
      list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ELSE [array_to_string(t, ' ')] END
  ) AS gram
  FROM toks
)
SELECT gram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM grams
GROUP BY gram
ORDER BY n_occurrences DESC, gram
LIMIT 20
"""


@register("q_shingle_topk", oracle=_SHINGLE_TOPK_ORACLE)
def q_shingle_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word 3-grams (the n-gram frequency census
    behind contamination checks and boilerplate detection).

    Plan shape: explode(shingles) -> two-level agg. The explode is
    map-side (no shuffle); the count shuffles (gram) pairs with
    map-side partial aggregation, so the wire carries one row per
    distinct gram per partition, not one per occurrence. Final top-k
    is TakeOrdered — no global sort.
    """
    from corrie_spark.operators.dedup import shingles

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(shingles("text", 3)).alias("gram"))
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "gram")
        .limit(20)
    )


# Deterministic hash-split: md5-derived 60-bit hash mod 1000 buckets.
# Unlike rand()-based sampling this is reproducible across runs,
# engines, and cluster sizes, and a document keeps its split forever
# (the property train/val/test contamination control depends on).
_SPLIT_BUCKET = "CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000"

_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT source,
    CASE WHEN {_SPLIT_BUCKET} < 900 THEN 'train'
         WHEN {_SPLIT_BUCKET} < 950 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs
FROM assigned
GROUP BY source, split
ORDER BY source, split
"""


@register("q_train_test_split", oracle=_SPLIT_ORACLE)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by md5 bucket of
    doc_id — reproducible across runs/engines/cluster sizes, stable
    per document (contamination control). Assignment is a pure
    projection; only the count rolls up."""
    from corrie_spark.operators.dedup import hash60

    docs = load(spark, sf_dir, "documents")
    bucket = hash60(F.col("doc_id").cast("string"), salt="split") % 1000
    split = (
        F.when(bucket < 900, "train").when(bucket < 950, "val").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )


# --- training-data pipeline composites ------------------------------------

# 5-gram contamination shingles: long enough that chance collisions in
# a small vocabulary vanish and only genuine shared passages match
_CONTAM_K = 5
_GRAMS_SQL = f"""
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= {_CONTAM_K} THEN
      list_transform(range(1, len(t) - {_CONTAM_K - 2}),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
    ELSE [array_to_string(t, ' ')] END
  ) AS gram
  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS t
        FROM documents)
"""

_CONTAM_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, source,
    CASE WHEN {_SPLIT_BUCKET} < 900 THEN 'train'
         WHEN {_SPLIT_BUCKET} < 950 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
),
grams AS ({_GRAMS_SQL}),
train_grams AS (
  SELECT DISTINCT gram FROM grams JOIN assigned USING (doc_id) WHERE split = 'train'
),
test_docs AS (
  SELECT doc_id, source FROM assigned WHERE split = 'test'
),
contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM grams g
  JOIN test_docs td USING (doc_id)
  WHERE g.gram IN (SELECT gram FROM train_grams)
)
SELECT td.source,
       COUNT(*) AS n_test_docs,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS contamination_rate
FROM test_docs td LEFT JOIN contaminated c USING (doc_id)
GROUP BY td.source
ORDER BY td.source
"""


@register("q_split_contamination", oracle=_CONTAM_ORACLE)
def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: which held-out documents share
    a word 5-gram with ANY training document — the pre-training
    hygiene check run before a data mix ships (5-grams: chance
    collisions vanish, genuine shared passages remain).

    Plan shape (round-14: split filters pushed BELOW the explode —
    the split is a pure doc_id projection, so each side explodes only
    its own split's documents instead of joining (doc, gram) pairs of
    the WHOLE corpus against the assignment twice; 2 full shingle
    passes + 2 doc-keyed joins became 0.9 + 0.05 of one pass): grams
    explode map-side post-filter, and the contamination test is a
    LEFT-SEMI join of test-side (doc, gram) pairs against distinct
    train grams — co-partitioned shuffle on gram, no all-pairs doc
    comparison, output bounded by |test docs|. At 100 TB the
    train-gram side stays a distinct-gram table (partial agg before
    the exchange) and hot boilerplate grams are exactly the AQE
    skew-join case."""
    from corrie_spark.operators.dedup import hash60, shingles
    from corrie_spark.tables import spread

    # round-14 (guide §2.5): both shingle explodes run pre-exchange on
    # the scan's layout; spread is a no-op at real scale. A/B at sf0.1:
    # 1.7 -> 1.5 s, rows identical.
    docs = spread(load(spark, sf_dir, "documents"))
    bucket = hash60(F.col("doc_id").cast("string"), salt="split") % 1000

    train_grams = (
        docs.filter(bucket < 900)
        .select(F.explode(shingles("text", _CONTAM_K)).alias("gram"))
        .distinct()
    )
    test_docs = docs.filter(bucket >= 950).select("doc_id", "source")
    contaminated = (
        docs.filter(bucket >= 950)
        .select("doc_id", F.explode(shingles("text", _CONTAM_K)).alias("gram"))
        .join(train_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        test_docs.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_test_docs"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_contaminated"),
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


# Gopher-style corpus filter rules (Rae et al. 2021, §A1.1 shapes):
# token-count window, mean token length window, minimum stopword
# evidence, bounded symbol ratio. Thresholds tuned to the synthetic
# corpus so both retained and rejected classes are non-empty.
_F_NTOK_MIN, _F_NTOK_MAX = 10, 500
_F_MTL_MIN, _F_MTL_MAX = 2.0, 10.0
_F_STOP_MIN = 0.03
_F_PUNCT_MAX = 0.2

_FILTER_ORACLE = f"""
WITH feat AS (
  SELECT doc_id, source, length(text) AS n_chars,
         {_NTOK} AS n_tokens, {_NTOKCHARS} AS n_token_chars,
         {_NSTOP} AS n_stop, {_NPUNCT} AS n_punct
  FROM documents
),
rules AS (
  SELECT source,
    (n_tokens BETWEEN {_F_NTOK_MIN} AND {_F_NTOK_MAX}) AS ok_tokens,
    (CAST(n_token_chars AS DOUBLE) / greatest(n_tokens, 1)
       BETWEEN {_F_MTL_MIN} AND {_F_MTL_MAX}) AS ok_token_len,
    (CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= {_F_STOP_MIN}) AS ok_stopwords,
    (CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) <= {_F_PUNCT_MAX}) AS ok_punct
  FROM feat
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN ok_tokens AND ok_token_len AND ok_stopwords AND ok_punct
                THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
  CAST(SUM(CASE WHEN NOT ok_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_tokens,
  CAST(SUM(CASE WHEN NOT ok_token_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_token_len,
  CAST(SUM(CASE WHEN NOT ok_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopwords,
  CAST(SUM(CASE WHEN NOT ok_punct THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_punct,
  CAST(SUM(CASE WHEN ok_tokens AND ok_token_len AND ok_stopwords AND ok_punct
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS retention_rate
FROM rules
GROUP BY source
ORDER BY source
"""


@register("q_corpus_filter", oracle=_FILTER_ORACLE)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality filtering with per-rule accounting: how
    many documents each rule rejects and what survives all of them —
    the go/no-go dashboard for a training-data mix. One projection +
    one aggregation; zero extra scans however many rules compose."""
    docs = load(spark, sf_dir, "documents")
    # round-14: the four rule flags come from ONE bound features struct
    # (each field reference re-evaluated the full pipeline before)
    flags = bind(
        T.quality_features("text"),
        lambda s: F.struct(
            s["n_tokens"].between(_F_NTOK_MIN, _F_NTOK_MAX).alias("ok_tokens"),
            s["mean_token_len"].between(_F_MTL_MIN, _F_MTL_MAX).alias("ok_token_len"),
            (s["stopword_ratio"] >= _F_STOP_MIN).alias("ok_stopwords"),
            (s["punct_ratio"] <= _F_PUNCT_MAX).alias("ok_punct"),
        ),
    )
    feat = docs.select("source", flags.alias("_ok")).select("source", "_ok.*")
    retained = (
        F.col("ok_tokens") & F.col("ok_token_len") & F.col("ok_stopwords") & F.col("ok_punct")
    )

    def fails(c: str):
        return F.sum(F.when(~F.col(c), 1).otherwise(0)).cast("bigint")

    return (
        feat.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(retained, 1).otherwise(0)).cast("bigint").alias("n_retained"),
            fails("ok_tokens").alias("n_fail_tokens"),
            fails("ok_token_len").alias("n_fail_token_len"),
            fails("ok_stopwords").alias("n_fail_stopwords"),
            fails("ok_punct").alias("n_fail_punct"),
            (
                F.sum(F.when(retained, 1).otherwise(0)).cast("double") / F.count(F.lit(1))
            ).alias("retention_rate"),
        )
    )


_HIST_ORACLE = f"""
WITH feat AS (
  SELECT lang, {_NTOK} AS n_tokens FROM documents
),
bucketed AS (
  SELECT lang, n_tokens,
         CAST(floor(log2(greatest(n_tokens, 1))) AS BIGINT) AS bucket
  FROM feat
)
SELECT lang, bucket,
       CAST(2 ** bucket AS BIGINT) AS bucket_min_tokens,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM bucketed
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


@register("q_token_histogram", oracle=_HIST_ORACLE)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count distribution in power-of-2 buckets per language —
    the sequence-length histogram behind packing/truncation decisions
    in a training mix. Exact integer log2 bucketing (floor of exact
    double log2 on integers <= 2^53: identical in both engines)."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = T.token_count("text")
    bucket = F.floor(F.log2(F.greatest(n_tokens, F.lit(1)))).cast("bigint")
    return (
        docs.select("lang", n_tokens.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.pow(F.lit(2.0), F.col("bucket")).cast("bigint").alias("bucket_min_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


_BIGRAMS = (
    "CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)), "
    "i -> t[i] || ' ' || t[i+1]) ELSE [] END"
)

# max sorted-run length / n: O(n log n) per row in BOTH engines —
# sort, find run-boundary positions, diff consecutive boundaries.
# (A count-per-distinct-element formulation is O(n^2) best case, and
# naive lambda nesting re-evaluates the tokenizer per element for
# O(n^3): this shape is the one that survives long documents.)
def _top_frac_sql(arr: str) -> str:
    return f"""(
  SELECT CAST(COALESCE(list_max(
           list_transform(bpos, (b, i) -> COALESCE(bpos[i + 1], len(s) + 1) - b)
         ), 0) AS DOUBLE) / greatest(len(s), 1)
  FROM (
    SELECT s, list_filter(range(1, len(s) + 1),
                          i -> i = 1 OR s[i] <> s[greatest(i - 1, 1)]) AS bpos
    FROM (SELECT list_sort({arr}) AS s)
  )
)"""


_REP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS t
  FROM documents
),
feat AS (
  SELECT doc_id, t, {_BIGRAMS} AS b FROM toks
)
SELECT doc_id,
  len(t) AS n_tokens,
  CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1) AS distinct_token_ratio,
  {_top_frac_sql('t')} AS top_token_fraction,
  {_top_frac_sql('b')} AS top_bigram_fraction,
  1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / greatest(len(b), 1)
    AS dup_bigram_fraction
FROM feat
"""


@register("q_text_repetition", oracle=_REP_ORACLE)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1: most-common-word fraction, duplicate n-gram fractions) —
    the filter family that catches boilerplate and degenerate
    generations. Row-local and shuffle-free at any corpus size; the
    most-common-element count is max-sorted-run-length (O(n log n)),
    with every array bound ONCE via functions.bind — Catalyst inlines
    subexpressions into higher-order lambdas on every reference, so
    the naive nesting is O(n^3) per row and 200x slower on 100-token
    documents."""
    from corrie_spark.functions import bind
    from corrie_spark.tables import spread

    # guide §2.5 conditional spread (no-op at real scale); A/B at
    # sf0.1: 0.63 -> 0.37 s, rows identical
    docs = spread(load(spark, sf_dir, "documents"))

    def top_fraction(arr: F.Column) -> F.Column:
        def of_sorted(s: F.Column) -> F.Column:
            n = F.size(s)
            bpos = F.filter(
                F.sequence(F.lit(1), n),
                lambda i: (i == 1)
                | (
                    F.try_element_at(s, i.cast("int"))
                    != F.try_element_at(s, F.greatest(i - 1, F.lit(1)).cast("int"))
                ),
            )
            runs = bind(
                bpos,
                lambda bp: F.transform(
                    bp,
                    lambda b, i: F.coalesce(
                        F.try_element_at(bp, (i + F.lit(2)).cast("int")), n + 1
                    )
                    - b,
                ),
            )
            return F.coalesce(F.array_max(runs), F.lit(0)).cast("double") / F.greatest(
                n, F.lit(1)
            )

        return F.when(F.size(arr) == 0, F.lit(0.0)).otherwise(
            bind(F.array_sort(arr), of_sorted)
        )

    def signals(t: F.Column) -> F.Column:
        bigrams = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.try_element_at(t, i.cast("int")),
                    F.try_element_at(t, (i + 1).cast("int")),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

        def with_bigrams(b: F.Column) -> F.Column:
            return F.struct(
                F.size(t).alias("n_tokens"),
                (
                    F.size(F.array_distinct(t)).cast("double")
                    / F.greatest(F.size(t), F.lit(1))
                ).alias("distinct_token_ratio"),
                top_fraction(t).alias("top_token_fraction"),
                top_fraction(b).alias("top_bigram_fraction"),
                (
                    F.lit(1.0)
                    - F.size(F.array_distinct(b)).cast("double")
                    / F.greatest(F.size(b), F.lit(1))
                ).alias("dup_bigram_fraction"),
            )

        return bind(bigrams, with_bigrams)

    sig = bind(T.tokens("text"), signals)
    return docs.withColumn("_sig", sig).select(
        "doc_id",
        F.col("_sig.n_tokens").alias("n_tokens"),
        F.col("_sig.distinct_token_ratio").alias("distinct_token_ratio"),
        F.col("_sig.top_token_fraction").alias("top_token_fraction"),
        F.col("_sig.top_bigram_fraction").alias("top_bigram_fraction"),
        F.col("_sig.dup_bigram_fraction").alias("dup_bigram_fraction"),
    )


_SAMPLE_BUCKET = "CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100"

_SAMPLE_ORACLE = f"""
WITH tagged AS (
  SELECT source, n_chars, ({_SAMPLE_BUCKET} < 20) AS sampled
  FROM documents
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS sample_rate,
  CAST(SUM(CASE WHEN sampled THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM tagged
GROUP BY source
"""


@register("q_stratified_sample", oracle=_SAMPLE_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% stratified sample per source via an md5
    bucket — the subsampling primitive for data-mix ablations. Unlike
    df.sample()/rand(), membership is a pure function of doc_id:
    reproducible across runs, engines, and cluster sizes, stable as
    the corpus grows (a doc never flips in or out), and disjoint from
    the train/val/test salt. Pure projection + one aggregation."""
    from corrie_spark.operators.dedup import hash60

    docs = load(spark, sf_dir, "documents")
    sampled = (hash60(F.col("doc_id").cast("string"), salt="sample") % 100) < 20
    return (
        docs.select("source", "n_chars", sampled.alias("sampled"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("sampled"), 1).otherwise(0)).cast("bigint").alias("n_sampled"),
            (
                F.sum(F.when(F.col("sampled"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("sample_rate"),
            F.sum(F.when(F.col("sampled"), F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("sampled_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --- PII scrub audit --------------------------------------------------------

_PII_BODY_SQL = """
  text ||
  CASE WHEN doc_id % 3 = 0
       THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@corp'
            || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
       ELSE '' END ||
  CASE WHEN doc_id % 4 = 0
       THEN ' call 201-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
"""

_PII_ORACLE = f"""
WITH bodies AS (
  SELECT doc_id, source, {_PII_BODY_SQL} AS body FROM documents
),
scrubbed AS (
  SELECT doc_id, source, body,
         len(regexp_extract_all(body, '{T.EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(body, '{T.PHONE_RE}')) AS n_phones,
         regexp_replace(regexp_replace(body, '{T.EMAIL_RE}', '[EMAIL]', 'g'),
                        '{T.PHONE_RE}', '[PHONE]', 'g') AS clean
  FROM bodies
)
SELECT
  source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_emails) AS BIGINT) AS n_emails,
  CAST(SUM(n_phones) AS BIGINT) AS n_phones,
  CAST(SUM(length(body)) AS BIGINT) AS chars_before,
  CAST(SUM(length(clean)) AS BIGINT) AS chars_after
FROM scrubbed
GROUP BY source
ORDER BY source
"""


@register("q_text_pii", oracle=_PII_ORACLE)
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit per source: emails/phones found and the char
    delta after redaction. PII is deterministically synthesized onto
    the corpus (every 3rd doc an email, every 4th a phone) so the
    scrub surface is non-vacuous at every sf and the oracle replays
    byte-identical bodies. Operators are row-local regex map stages —
    zero shuffle before the final per-source aggregation."""
    docs = load(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@corp"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" call 201-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    rows = docs.select(
        "source",
        body.alias("body"),
        T.pii_counts(body).alias("pii"),
        T.scrub_pii(body).alias("clean"),
    )
    return (
        rows.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pii.n_emails").alias("n_emails"),
            F.sum("pii.n_phones").alias("n_phones"),
            F.sum(F.length("body")).cast("bigint").alias("chars_before"),
            F.sum(F.length("clean")).cast("bigint").alias("chars_after"),
        )
        .orderBy("source")
    )


# --- chunking + shard packing ----------------------------------------------

_CHUNK, _OVERLAP = 64, 16
_STRIDE = _CHUNK - _OVERLAP

_CHUNKS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS t
  FROM documents
),
meta AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= {_CHUNK} THEN 1
              ELSE CAST(ceil((len(t) - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) + 1
         END AS n_chunks
  FROM toks
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(0, n_chunks),
                i -> {{'idx': i,
                      'chunk': t[i*{_STRIDE}+1 : i*{_STRIDE}+{_CHUNK}]}})) AS c
  FROM meta
)
SELECT doc_id,
       CAST(c.idx AS BIGINT) AS chunk_idx,
       CAST(len(c.chunk) AS BIGINT) AS n_tokens,
       md5(array_to_string(c.chunk, ' ')) AS chunk_fp
FROM chunks
"""


@register("q_doc_chunks", oracle=_CHUNKS_ORACLE)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, 16-token
    overlap) with stable (doc_id, chunk_idx) identity and a chunk
    fingerprint — the pre-training/RAG chunking step. Pure map stage
    (tokenize + sequence + slice in one projection, plan-pinned
    shuffle-free); the oracle rebuilds every chunk and its md5."""
    from corrie_spark.operators.packing import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=_CHUNK, overlap=_OVERLAP)


_PACK_BUDGET = 2000

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_NTOK} AS n_tokens,
         ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT CAST(floor(cum_before / {_PACK_BUDGET}.0) AS BIGINT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
FROM c
GROUP BY 1
ORDER BY shard
"""


@register("q_pack_shards", oracle=_PACK_ORACLE)
def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: docs in deterministic hash order,
    exclusive running token count, shard = floor(cum_before / 2000) —
    reproducible bin packing into ~2000-token training shards.

    The scale story is the prefix sum: a naive SUM() OVER (ORDER BY)
    is a single-partition global window in Spark; packing.
    distributed_cumsum range-partitions the hash axis, runs local
    windows, and broadcasts #partitions offsets — every stage
    parallel. The oracle IS the naive global window (DuckDB), proving
    the two-phase sum equals it exactly."""
    from corrie_spark.operators.packing import pack_shards
    from corrie_spark.operators.text import token_count

    docs = load(spark, sf_dir, "documents")
    sized = docs.select("doc_id", token_count("text").cast("long").alias("n_tokens"))
    packed = pack_shards(sized, "doc_id", "n_tokens", budget=_PACK_BUDGET)
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
        .orderBy("shard")
    )


_MIX_BUDGET = 500

_MIX_ORACLE = f"""
WITH t AS (
  SELECT source, doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_tokens
  FROM t
)
SELECT source, doc_id, n_tokens, CAST(before_tokens AS BIGINT) AS before_tokens
FROM c
WHERE before_tokens < {_MIX_BUDGET}
"""


@register("q_mix_budget_sample", oracle=_MIX_ORACLE)
def q_mix_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling: per source, documents in
    deterministic hash-shuffled order fill a 500-token budget (kept
    iff the exclusive running count is still under budget) — the
    reproducible "N tokens per source" training-mix draw. One global
    two-phase prefix sum over the (source, hash) composite key plus a
    #sources-row offset broadcast; the oracle is the naive per-source
    window, proving the distributed sum equals it exactly
    (operators/packing.token_budget_sample)."""
    from corrie_spark.operators.packing import token_budget_sample
    from corrie_spark.operators.text import token_count

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    return token_budget_sample(sized, budget=_MIX_BUDGET)


# --- BM25 retrieval over the corpus (inverted-index shape) -----------------

_BM25_TERMS = ("stream", "merge", "window")
_BM25_K1 = "1.2"
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

# per-(doc, term) partial score. RATIONAL BM25 variant: the classic
# log-idf is replaced by the odds ratio (N - df + 0.5)/(df + 0.5) it
# wraps — monotonic in the same direction, but free of transcendental
# functions, so both engines produce bit-identical doubles (IEEE
# +,*,/ only, identical parenthesization on both sides)
_BM25_SCORE = (
    "((CAST(tf AS DOUBLE) * 2.2) / "
    f"(CAST(tf AS DOUBLE) + {_BM25_K1} * (0.25 + (0.75 * (CAST(dl AS DOUBLE) / avgdl))))) "
    "* ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
)

_BM25_TERM_COLS = ", ".join(
    f"SUM(CASE WHEN term = '{t}' THEN s END) AS s{i}" for i, t in enumerate(_BM25_TERMS)
)
_BM25_TOTAL = " + ".join(f"COALESCE(s{i}, 0.0)" for i in range(len(_BM25_TERMS)))
_BM25_NMATCH = " + ".join(
    f"(CASE WHEN s{i} IS NOT NULL THEN 1 ELSE 0 END)" for i in range(len(_BM25_TERMS))
)

_BM25_ORACLE = f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS toks
  FROM documents
),
dls AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dls
),
postings AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, UNNEST(toks) AS term FROM dls)
  WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, dl, term
),
dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term),
scored AS (
  SELECT doc_id, term, {_BM25_SCORE} AS s
  FROM postings JOIN dfs USING (term) CROSS JOIN stats
),
per_doc AS (
  SELECT doc_id, {_BM25_TERM_COLS} FROM scored GROUP BY doc_id
)
SELECT doc_id,
       {_BM25_TOTAL} AS bm25,
       CAST({_BM25_NMATCH} AS BIGINT) AS n_matched
FROM per_doc
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


def bm25_rank(docs: DataFrame, k: int = 10) -> DataFrame:
    """Top-k BM25 ranking over an arbitrary documents frame — the
    retrieval engine behind q_text_bm25_topk, reusable over filtered
    corpora (e.g. dedup-survivor-only retrieval). See the query
    docstring for the scale/plan argument."""
    from corrie_spark.functions.core import bind

    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: F.length(t) > 0)

    def tf_struct(tk: F.Column) -> F.Column:
        return F.struct(
            F.size(tk).cast("bigint").alias("dl"),
            *[
                F.size(F.filter(tk, lambda x: x == t)).cast("bigint").alias(f"tf{i}")
                for i, t in enumerate(_BM25_TERMS)
            ],
        )

    per_doc = docs.select("doc_id", bind(toks, tf_struct).alias("e")).select(
        "doc_id", "e.*"
    )
    consts = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("dl").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avgdl"
        ),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    ).collect()[0]
    total = None
    nmatch = None
    for i in range(len(_BM25_TERMS)):
        s_i = F.expr(
            _BM25_SCORE.replace("tf", f"tf{i}")
            .replace("avgdl", f"CAST('{float(consts['avgdl'])!r}' AS DOUBLE)")
            .replace("n_docs", str(int(consts["n_docs"])))
            .replace("df", str(int(consts[f"df{i}"])))
        )
        c = F.when(F.col(f"tf{i}") > 0, s_i).otherwise(0.0)
        total = c if total is None else total + c
        m = F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)
        nmatch = m if nmatch is None else nmatch + m
    return (
        per_doc.filter(sum(F.col(f"tf{i}") for i in range(len(_BM25_TERMS))) > 0)
        .select("doc_id", total.alias("bm25"), nmatch.cast("bigint").alias("n_matched"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


@register("q_text_bm25_topk", oracle=_BM25_ORACLE)
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a 3-term query by BM25 (rational-idf
    variant — see oracle comment) — the inverted-index retrieval
    shape over the corpus.

    100 TB shape: per-term tf is computed MAP-SIDE as
    size(filter(tokens, == term)) — no corpus-wide explode, no
    (doc, term) groupBy shuffle. Pass 1 is ONE aggregation producing
    the corpus constants (n_docs, avgdl, and df per query term —
    2 + |query| numbers, collected and folded into the scoring
    projection as literals, the same metadata-sized-collect
    discipline as the k-means centroids); pass 2 is a map-only score
    + TakeOrdered top-10. Two scans, zero joins, never a global
    sort. All score arithmetic is IEEE +,*,/ with identical
    parenthesization in both engines — bit-identical doubles, no
    tolerance needed (the literal constants round-trip exactly:
    int64 df, one IEEE double avgdl). The oracle builds tf by
    unnest+count — same values, different engine-appropriate plan."""
    return bm25_rank(load(spark, sf_dir, "documents"), k=10)


# --- robust outlier detection: per-source MAD on doc length ----------------

_OUTLIER_ORACLE = """
WITH med AS (
  SELECT source, median(n_chars) AS med_chars
  FROM documents GROUP BY source
),
dev AS (
  SELECT d.source, d.doc_id, d.n_chars, m.med_chars,
         abs(d.n_chars - m.med_chars) AS adev
  FROM documents d JOIN med m USING (source)
),
mad AS (
  SELECT source, median(adev) AS mad_chars FROM dev GROUP BY source
)
SELECT dev.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(ANY_VALUE(dev.med_chars) AS DOUBLE) AS median_chars,
       CAST(ANY_VALUE(mad.mad_chars) AS DOUBLE) AS mad_chars,
       CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad_chars THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING (source)
GROUP BY dev.source
ORDER BY dev.source
"""


@register("q_outlier_docs", oracle=_OUTLIER_ORACLE)
def q_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length-outlier report: median/MAD of n_chars
    (both exact interpolated percentiles over integers — one IEEE
    midpoint op, identical cross-engine) and the count of docs beyond
    3 MADs — the scale/quality screen that, unlike mean/stddev, a few
    giant crawl artifacts cannot drag.

    Plan shape: two source-keyed exact-percentile aggregations with
    the doc frame re-joined via BROADCAST (#sources rows each), one
    final per-source count — the fact table shuffles once per
    percentile pass. Exact percentile is single-pass-per-group
    sort-based; at 100 TB swap median() for approx_percentile exactly
    as q_percentiles_approx documents (call shape unchanged)."""
    docs = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    med = docs.groupBy("source").agg(F.median("n_chars").alias("med_chars"))
    dev = docs.join(F.broadcast(med), "source").select(
        "source",
        "med_chars",
        F.abs(F.col("n_chars") - F.col("med_chars")).alias("adev"),
    )
    mad = dev.groupBy("source").agg(F.median("adev").alias("mad_chars"))
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.any_value("med_chars").cast("double").alias("median_chars"),
            F.any_value("mad_chars").cast("double").alias("mad_chars"),
            F.sum((F.col("adev") > 3 * F.col("mad_chars")).cast("int"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("source")
    )


# --- in-engine BPE-style merge training ------------------------------------

_BPE_ROUNDS = 3


def _bpe_ctes(n_rounds: int) -> str:
    """CTE chain t0 -> (p_r, c_r, w_r, t_r)*: the DuckDB replay of
    operators/bpe.train_merges — same adjacent-pair counts, same
    (count DESC, a, b) winner, same left-to-right list-fold merge."""
    parts = [
        "t0 AS (\n"
        f"  SELECT CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS t\n"
        "  FROM documents\n)"
    ]
    for r in range(1, n_rounds + 1):
        prev = f"t{r - 1}"
        parts.append(
            f"p{r} AS (SELECT t[i] AS a, t[i+1] AS b FROM {prev}, UNNEST(range(1, len(t))) AS u(i))"
        )
        parts.append(
            f"c{r} AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM p{r} GROUP BY a, b)"
        )
        parts.append(f"w{r} AS (SELECT a, b, n FROM c{r} ORDER BY n DESC, a, b LIMIT 1)")
        parts.append(
            f"t{r} AS (\n"
            "  SELECT CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[]) ELSE\n"
            "    list_reduce(list_transform(t, x -> [x]),\n"
            "      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = w.a AND x[1] = w.b\n"
            "                  THEN acc[1:len(acc)-1] || [w.a || ' ' || w.b]\n"
            "                  ELSE acc || x END) END AS t\n"
            f"  FROM {prev} CROSS JOIN w{r} w\n)"
        )
    return ",\n".join(parts)


_BPE_ORACLE = f"""
WITH {_bpe_ctes(_BPE_ROUNDS)}
SELECT * FROM (
{" UNION ALL ".join(f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS token_a, b AS token_b, n AS pair_count FROM w{r}" for r in range(1, _BPE_ROUNDS + 1))}
) ORDER BY merge_rank
"""


@register("q_text_bpe_merges", oracle=_BPE_ORACLE)
def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine BPE-style vocabulary induction: 3 greedy word-level
    merge rounds (count adjacent pairs -> merge the winner -> repeat)
    trained by DataFrame rounds with a 1-row collect per round — the
    same iterative-trainer discipline as the Lloyd k-means. The
    oracle replays every round (winner selection AND the fold-merge
    re-tokenization), so the learned merge table is cross-engine
    exact. See operators/bpe.py for the scale argument."""
    from corrie_spark.operators.bpe import train_merges
    from corrie_spark.queries.dedup_queries import _memo

    def build():
        merges = train_merges(load(spark, sf_dir, "documents"), n_merges=_BPE_ROUNDS)
        return spark.createDataFrame(
            [(r, a, b, n) for r, a, b, n in merges],
            "merge_rank long, token_a string, token_b string, pair_count long",
        ).orderBy("merge_rank").persist()

    # session-memoized like the kmeans trainer: rounds are sequential
    # driver-coordinated work, paid once per (session, sf)
    return _memo(spark, sf_dir, "bpe_merges", build)


# --- temperature-flattened mixture sampling --------------------------------

_TEMP_SCALE = 1 << 30

_TEMP_ORACLE = f"""
WITH totals AS (
  SELECT source, CAST(SUM({_NTOK}) AS BIGINT) AS w
  FROM documents GROUP BY source
),
weighted AS (SELECT source, sqrt(CAST(w AS DOUBLE)) AS p FROM totals),
thr AS (
  SELECT source,
         CAST(floor(p / (SELECT MAX(p) FROM weighted) * {_TEMP_SCALE}) AS BIGINT) AS t
  FROM weighted
),
marked AS (
  SELECT d.source, {_NTOK} AS ntok,
         ('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % {_TEMP_SCALE} < t.t AS kept
  FROM documents d JOIN thr t USING (source)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM marked
GROUP BY source
ORDER BY source
"""


@register("q_mix_temperature", oracle=_TEMP_ORACLE)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture (T=2): acceptance ∝ sqrt(source
    token share), so small sources keep proportionally more — the
    multilingual-LM upsampling recipe as a deterministic hash
    Bernoulli. Per-source report of kept docs/tokens; the accept
    threshold table is #sources rows broadcast into the scan."""
    from corrie_spark.operators.packing import temperature_sample

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count("text").alias("n_tokens")
    )
    marked = temperature_sample(docs, temperature=2.0, scale=_TEMP_SCALE)
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("source")
    )


# --- REAL subword BPE over the word-frequency table ------------------------


def _sub_bpe_ctes(n_rounds: int) -> str:
    parts = [
        "vocab AS (\n"
        f"  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq\n"
        f"  FROM (SELECT unnest({_TOKS}) AS w FROM documents WHERE length(trim(text)) > 0) x\n"
        "  GROUP BY w\n)",
        "s0 AS (SELECT w, list_transform(range(1, length(w) + 1), i -> w[i]) AS s, freq FROM vocab)",
    ]
    for r in range(1, n_rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"sp{r} AS (SELECT s[i] AS a, s[i+1] AS b, freq FROM {prev}, UNNEST(range(1, len(s))) AS u(i))"
        )
        parts.append(
            f"sc{r} AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS n FROM sp{r} GROUP BY a, b)"
        )
        parts.append(f"sw{r} AS (SELECT a, b, n FROM sc{r} ORDER BY n DESC, a, b LIMIT 1)")
        parts.append(
            f"s{r} AS (\n"
            "  SELECT w, CASE WHEN len(s) = 0 THEN s ELSE\n"
            "    list_reduce(list_transform(s, x -> [x]),\n"
            "      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = w.a AND x[1] = w.b\n"
            "                  THEN acc[1:len(acc)-1] || [w.a || w.b]\n"
            "                  ELSE acc || x END) END AS s, freq\n"
            f"  FROM {prev} CROSS JOIN sw{r} w\n)"
        )
    return ",\n".join(parts)


_SUB_BPE_ORACLE = f"""
WITH {_sub_bpe_ctes(_BPE_ROUNDS)}
SELECT * FROM (
{" UNION ALL ".join(f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS sym_a, b AS sym_b, n AS weighted_count FROM sw{r}" for r in range(1, _BPE_ROUNDS + 1))}
) ORDER BY merge_rank
"""


def _subword_merges_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the trained subword merge table — shared by
    q_text_bpe_subword (reports it) and q_text_bpe_tokenize (applies
    it), so the trainer rounds run once per (session, sf)."""
    from corrie_spark.operators.bpe import train_subword_merges
    from corrie_spark.queries.dedup_queries import _memo

    def build():
        merges = train_subword_merges(
            load(spark, sf_dir, "documents"), n_merges=_BPE_ROUNDS
        )
        return spark.createDataFrame(
            [(r, a, b, n) for r, a, b, n in merges],
            "merge_rank long, sym_a string, sym_b string, weighted_count long",
        ).persist()

    return _memo(spark, sf_dir, "bpe_subword", build)


@register("q_text_bpe_subword", oracle=_SUB_BPE_ORACLE)
def q_text_bpe_subword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE subword BPE (Sennrich et al. 2016 training structure):
    merges learned over the word-FREQUENCY table — the corpus pays
    one tokenize+count shuffle, then every merge round is vocab-sized
    regardless of corpus scale. Frequency-weighted pair counts,
    deterministic winner, fold-merge applied per word; the oracle
    replays all rounds including the symbol-sequence rewrites."""
    return _subword_merges_frame(spark, sf_dir).orderBy("merge_rank")


_BPE_TOKENIZE_ORACLE = f"""
WITH {{ctes}},
psw AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest({_TOKS}) AS w FROM documents WHERE length(trim(text)) > 0) x
  GROUP BY source, w
),
seg AS (SELECT w, CAST(len(s) AS BIGINT) AS n_sym FROM s{_BPE_ROUNDS})
SELECT p.source,
       CAST(SUM(p.cnt) AS BIGINT) AS n_words,
       CAST(SUM(p.cnt * s.n_sym) AS BIGINT) AS n_subword_tokens,
       CAST(SUM(p.cnt * s.n_sym) AS DOUBLE) / SUM(p.cnt) AS avg_subwords_per_word
FROM psw p JOIN seg s USING (w)
GROUP BY p.source
ORDER BY p.source
""".format(ctes=_sub_bpe_ctes(_BPE_ROUNDS))


@register("q_text_bpe_tokenize", oracle=_BPE_TOKENIZE_ORACLE)
def q_text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned subword merges to the corpus: per-source
    word / subword-token counts and the compression ratio — the
    tokenizer-throughput metric a data pipeline reports per source.
    Segmentation runs over the VOCAB (distinct words), then joins the
    per-(source, word) counts — the corpus never re-folds; merge
    literals come from the session-memoized trainer."""
    from corrie_spark.operators.bpe import apply_merges

    docs = load(spark, sf_dir, "documents")
    merges_df = _subword_merges_frame(spark, sf_dir)
    merges = [
        (int(r.merge_rank), r.sym_a, r.sym_b, int(r.weighted_count))
        for r in merges_df.collect()
    ]

    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "source", F.explode(T.tokens("text")).alias("w")
    )
    psw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    vocab = psw.select("w").distinct()
    seg = apply_merges(vocab, merges).select(
        "w", F.size("sym").cast("bigint").alias("n_sym")
    )
    return (
        psw.join(F.broadcast(seg), "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sym")).cast("bigint").alias("n_subword_tokens"),
            (
                F.sum(F.col("cnt") * F.col("n_sym")).cast("double") / F.sum("cnt")
            ).alias("avg_subwords_per_word"),
        )
        .orderBy("source")
    )


# --- TF-IDF top terms per source (rational idf — cross-engine exact) -------

_TFIDF_K = 5

# same transcendental-free odds-ratio idf as BM25 (see _BM25_SCORE):
# tf, df, n_docs are exact ints; the score is IEEE *,+,/ with
# identical parenthesization in both engines -> bit-identical doubles
_TFIDF_SCORE = (
    "CAST(tf AS DOUBLE) * "
    "((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
)

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS t
  FROM documents
),
exploded AS (SELECT doc_id, source, UNNEST(t) AS term FROM toks),
df_tbl AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM exploded GROUP BY term
),
tf_tbl AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM exploded GROUP BY source, term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT source, term, tf, df, {_TFIDF_SCORE} AS tfidf
  FROM tf_tbl JOIN df_tbl USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT source, term, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_TFIDF_K}
ORDER BY source, rnk
"""


@register("q_text_tfidf_terms", oracle=_TFIDF_ORACLE)
def q_text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} most source-characteristic terms by TF-IDF (rational
    odds-ratio idf — no transcendental functions, so scores are
    bit-identical across engines; ties broken by term).

    100 TB shape: the token explode feeds two partial-agg rollups —
    df per term (distinct doc count, term-keyed) and tf per
    (source, term) — both vocab-sized outputs, never corpus-sized
    shuffles beyond the one explode pass each. The scoring join is
    term-keyed (vocab x vocab equi-join), n_docs rides in as a
    broadcast one-row frame, and the final window partitions by
    source over VOCAB-sized input (per-source term lists are
    metadata relative to the corpus)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    exploded = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", "source", F.explode(T.tokens("text")).alias("term")
    )
    df_tbl = exploded.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    tf_tbl = exploded.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf_tbl.join(df_tbl, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.expr(_TFIDF_SCORE))
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TFIDF_K)
        .select("source", "term", "tf", "df", "tfidf", "rnk")
        .orderBy("source", "rnk")
    )


# --- pairwise source vocabulary overlap (Jaccard over distinct terms) ------

_VOCAB_ORACLE = """
WITH exploded AS (
  SELECT DISTINCT source,
         UNNEST(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0)) AS term
  FROM documents
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM exploded GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM exploded a JOIN exploded b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_common,
       CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = inter.source_a
JOIN sizes sb ON sb.source = inter.source_b
ORDER BY source_a, source_b
"""


@register("q_source_vocab_overlap", oracle=_VOCAB_ORACLE)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the domain-
    similarity matrix a mixture designer reads before weighting
    sources.

    100 TB shape: the corpus collapses to DISTINCT (source, term)
    first (vocab-sized — one explode + partial-agg distinct), so the
    pair join is vocab x vocab keyed on term, never corpus-sized;
    with S sources the output is S^2/2 rows and the per-source size
    table is broadcast back. Hot terms shared by all sources fan out
    S^2 per term at worst — bounded by the constant source count."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("source", F.explode(T.tokens("text")).alias("term"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = vocab.select(F.col("source").alias("source_a"), "term")
    b = vocab.select(F.col("source").alias("source_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .select("source_a", "source_b", "n_a", "n_b", "n_common", "jaccard")
        .orderBy("source_a", "source_b")
    )


# --- bigram language-model quality score (add-1 smoothing) -----------------

# Quantized integer log-probabilities: logq = floor(ln(num/den)*1e4)
# with num, den exact ints. The ONE transcendental (ln) is computed on
# identical doubles in both engines (num/den is a single
# correctly-rounded IEEE division of exact ints), then quantized to an
# int, so per-doc SUMS are exact integers — order-independent, unlike
# a float sum of raw logs. A last-ulp ln() divergence could only
# matter if ln lands within ~1e-16 of a 1e-4 quantization boundary
# (~1e-12 per distinct bigram — negligible, and confined to one gram).
_LM_LOGQ = (
    "CAST(floor(ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * 10000.0) AS BIGINT)"
)

_LM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS t
  FROM documents
),
bi AS (
  SELECT doc_id, source, UNNEST(t[1:len(t)-1]) AS w1, UNNEST(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM bi GROUP BY w1, w2),
ug AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cnt_u FROM bi GROUP BY w1),
vo AS (
  SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v
  FROM (SELECT UNNEST(t) AS term FROM toks)
),
scored AS (
  SELECT doc_id, source, {_LM_LOGQ.replace("num", "cnt_b + 1").replace("den", "cnt_u + v")} AS logq
  FROM bi JOIN bg USING (w1, w2) JOIN ug USING (w1) CROSS JOIN vo
),
per_doc AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(logq) AS BIGINT) AS s
  FROM scored GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
       CAST(SUM(s) AS BIGINT) AS sum_logq,
       -(CAST(SUM(s) AS DOUBLE) / (CAST(SUM(n_pairs) AS DOUBLE) * 10000.0)) AS avg_nll
FROM per_doc GROUP BY source ORDER BY source
"""


def _lm_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the per-doc LM score frame (doc_id, source,
    n_pairs, s): the bigram training + scoring joins run once and
    feed both the per-source report and the outlier query."""
    from corrie_spark.functions.core import bind
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")

        def pairs_of(tk: F.Column) -> F.Column:
            return F.when(
                F.size(tk) >= 2,
                F.zip_with(
                    F.slice(tk, 1, F.size(tk) - 1),
                    F.slice(tk, 2, F.size(tk) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

        bi = docs.select(
            "doc_id", "source", F.explode(bind(T.tokens("text"), pairs_of)).alias("p")
        ).select("doc_id", "source", "p.w1", "p.w2")
        bg = bi.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt_b")
        )
        ug = bi.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("cnt_u"))
        vo = docs.select(F.explode(T.tokens("text")).alias("term")).agg(
            F.countDistinct("term").cast("bigint").alias("v")
        )
        scored = (
            bi.join(bg, ["w1", "w2"])
            .join(ug, "w1")
            .crossJoin(F.broadcast(vo))
            .withColumn(
                "logq",
                F.expr(
                    _LM_LOGQ.replace("num", "cnt_b + 1").replace("den", "cnt_u + v")
                ),
            )
        )
        return (
            scored.groupBy("doc_id", "source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.sum("logq").cast("bigint").alias("s"),
            )
            .persist()
        )

    return _memo(spark, sf_dir, "lm_per_doc", build)


@register("q_text_lm_score", oracle=_LM_ORACLE)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency score per source: train add-1-
    smoothed bigram probabilities over the corpus, score every
    adjacent token pair, report per-source mean negative log-
    likelihood (nats/token-pair) — the classic perplexity-style
    quality filter (a held-out scorer is this operator pointed at a
    different snapshot).

    100 TB shape: one explode pass feeds the bigram/context count
    rollups (both vocab^-ish sized, partial-agg); scoring re-joins the
    bigram stream to the two count tables on their gram keys — plain
    equi-joins, AQE handles hot-gram skew; V rides in as a broadcast
    one-row frame; per-doc and per-source rollups are partial aggs
    over exact ints (see _LM_LOGQ note — no float-sum order
    sensitivity anywhere). The per-doc frame is a session memo shared
    with q_text_lm_outliers."""
    per_doc = _lm_per_doc(spark, sf_dir)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_pairs").cast("bigint").alias("n_pairs"),
            F.sum("s").cast("bigint").alias("sum_logq"),
            (
                -(
                    F.sum("s").cast("double")
                    / (F.sum("n_pairs").cast("double") * F.lit(10000.0))
                )
            ).alias("avg_nll"),
        )
        .orderBy("source")
    )


# --- exact OLS via integer normal equations (Cramer) -----------------------

def _det3(m) -> str | int:
    """3x3 determinant by first-column cofactor expansion — ONE shared
    formula emitted either as SQL over HUGEINT symbols (strings) or
    evaluated exactly over Python ints. Using the same generator for
    both engines removes any chance of a hand-derivation mismatch."""
    if isinstance(m[0][0], str):
        t = lambda r, c: f"CAST({m[r][c]} AS HUGEINT)"
        return (
            f"({t(0,0)} * ({t(1,1)} * {t(2,2)} - {t(1,2)} * {t(2,1)})"
            f" - {t(1,0)} * ({t(0,1)} * {t(2,2)} - {t(0,2)} * {t(2,1)})"
            f" + {t(2,0)} * ({t(0,1)} * {t(1,2)} - {t(0,2)} * {t(1,1)}))"
        )
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[1][0] * (m[0][1] * m[2][2] - m[0][2] * m[2][1])
        + m[2][0] * (m[0][1] * m[1][2] - m[0][2] * m[1][1])
    )


_OLS_SUMS = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
       CAST(SUM(x1 * x1) AS BIGINT) AS s11, CAST(SUM(x1 * x2) AS BIGINT) AS s12,
       CAST(SUM(x2 * x2) AS BIGINT) AS s22,
       CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x1 * y) AS BIGINT) AS s1y, CAST(SUM(x2 * y) AS BIGINT) AS s2y
FROM (SELECT {_NTOK} AS x1, {_NSTOP} AS x2, length(text) AS y FROM documents)
"""

_OLS_A = [["n", "sx1", "sx2"], ["sx1", "s11", "s12"], ["sx2", "s12", "s22"]]
_OLS_B = ["sy", "s1y", "s2y"]


def _ols_repl(col: int):
    return [
        [_OLS_B[r] if c == col else _OLS_A[r][c] for c in range(3)] for r in range(3)
    ]


_OLS_ORACLE = f"""
WITH sums AS ({_OLS_SUMS})
SELECT n AS n_docs,
       CAST({_det3(_ols_repl(0))} AS DOUBLE) / CAST({_det3(_OLS_A)} AS DOUBLE) AS beta0,
       CAST({_det3(_ols_repl(1))} AS DOUBLE) / CAST({_det3(_OLS_A)} AS DOUBLE) AS beta1,
       CAST({_det3(_ols_repl(2))} AS DOUBLE) / CAST({_det3(_OLS_A)} AS DOUBLE) AS beta2
FROM sums
"""


@register("q_ols_doc_length", oracle=_OLS_ORACLE)
def q_ols_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact in-engine OLS: fit n_chars ~ b0 + b1*n_tokens + b2*n_stopwords
    by the normal equations, solved with integer Cramer determinants —
    the distributed work is ONE partial aggregation of nine int64
    power/cross sums (order-independent, engine-independent), the
    3x3 solve is exact big-int arithmetic on the driver (metadata-
    sized collect, same discipline as the k-means centroids and PCA
    eigenvector), and the emitted coefficients are double(det_i) /
    double(det) — each determinant rounded to IEEE double FIRST, then
    one division, mirroring the oracle's HUGEINT->DOUBLE casts
    bit-for-bit.

    100 TB shape: one column-pruned scan, map-side combine into 9
    longs; nothing else moves."""
    docs = load(spark, sf_dir, "documents")
    x1 = T.token_count("text").cast("bigint")
    x2 = T.stopword_count("text").cast("bigint")
    y = F.length("text").cast("bigint")
    r = (
        docs.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x1").alias("sx1"),
            F.sum("x2").alias("sx2"),
            F.sum(F.col("x1") * F.col("x1")).alias("s11"),
            F.sum(F.col("x1") * F.col("x2")).alias("s12"),
            F.sum(F.col("x2") * F.col("x2")).alias("s22"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x1") * F.col("y")).alias("s1y"),
            F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        )
        .collect()[0]
    )
    s = {k: int(r[k]) for k in r.asDict()}
    a = [[s[v] for v in row] for row in _OLS_A]
    det = _det3(a)
    betas = [
        float(_det3([[s[v] for v in row] for row in _ols_repl(i)])) / float(det)
        for i in range(3)
    ]
    return spark.createDataFrame(
        [(s["n"], betas[0], betas[1], betas[2])],
        "n_docs bigint, beta0 double, beta1 double, beta2 double",
    )


_LM_OUTLIER_K = 20

_LM_OUTLIERS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS t
  FROM documents
),
bi AS (
  SELECT doc_id, source, UNNEST(t[1:len(t)-1]) AS w1, UNNEST(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM bi GROUP BY w1, w2),
ug AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cnt_u FROM bi GROUP BY w1),
vo AS (
  SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v
  FROM (SELECT UNNEST(t) AS term FROM toks)
),
scored AS (
  SELECT doc_id, source, {_LM_LOGQ.replace("num", "cnt_b + 1").replace("den", "cnt_u + v")} AS logq
  FROM bi JOIN bg USING (w1, w2) JOIN ug USING (w1) CROSS JOIN vo
),
per_doc AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(logq) AS BIGINT) AS s
  FROM scored GROUP BY doc_id, source
)
SELECT doc_id, source, n_pairs,
       -(CAST(s AS DOUBLE) / (CAST(n_pairs AS DOUBLE) * 10000.0)) AS nll
FROM per_doc
ORDER BY nll DESC, doc_id
LIMIT {_LM_OUTLIER_K}
"""


@register("q_text_lm_outliers", oracle=_LM_OUTLIERS_ORACLE)
def q_text_lm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k} least-fluent documents by bigram-LM mean NLL — the
    artifact a perplexity quality filter actually drops. Rides the
    session per-doc score memo (q_text_lm_score trains once); the
    top-k is a TakeOrdered over exact-int-derived doubles, ties to
    doc_id — deterministic in both engines."""
    per_doc = _lm_per_doc(spark, sf_dir)
    nll = -(
        F.col("s").cast("double") / (F.col("n_pairs").cast("double") * F.lit(10000.0))
    )
    return (
        per_doc.select("doc_id", "source", "n_pairs", nll.alias("nll"))
        .orderBy(F.col("nll").desc(), "doc_id")
        .limit(_LM_OUTLIER_K)
    )


# --- token-distribution entropy & KL drift (training-mix diagnostics) ------

# same quantized-log discipline as the bigram LM (_LM_LOGQ): the one
# ln() runs on an identical correctly-rounded double ratio in both
# engines, quantizes to an int, and every downstream sum is exact
# int64 — order-independent across partitionings.

_ENTROPY_ORACLE = """
WITH toks AS (
  SELECT source,
         UNNEST(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0)) AS term
  FROM documents
),
cnt AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY source, term),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS vocab
        FROM cnt GROUP BY source),
scored AS (
  SELECT c.source, c.c,
         CAST(floor(ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) * 10000.0) AS BIGINT) AS logq
  FROM cnt c JOIN tot t USING (source)
)
SELECT s.source, t.n AS n_tokens, t.vocab AS vocab_size,
       CAST(SUM(s.c * s.logq) AS BIGINT) AS sum_clogq,
       -(CAST(SUM(s.c * s.logq) AS DOUBLE) / (CAST(t.n AS DOUBLE) * 10000.0)) AS entropy_nats
FROM scored s JOIN tot t USING (source)
GROUP BY s.source, t.n, t.vocab
ORDER BY source
"""


@register("q_text_entropy", oracle=_ENTROPY_ORACLE)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats/token) of each source's unigram
    distribution — the diversity metric a mixture designer watches
    for mode collapse (low entropy = repetitive/templated source).

    100 TB shape: one explode -> (source, term) partial-agg count
    table (vocab-sized); totals re-join broadcast (#sources rows);
    the entropy sum is an exact int64 partial agg of c * logq."""
    docs = load(spark, sf_dir, "documents")
    cnt = (
        docs.select("source", F.explode(T.tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    scored = cnt.join(F.broadcast(tot), "source").withColumn(
        "logq",
        F.expr(
            "CAST(floor(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 10000.0) AS BIGINT)"
        ),
    )
    return (
        scored.groupBy("source", "n", "vocab")
        .agg(F.sum(F.col("c") * F.col("logq")).cast("bigint").alias("sum_clogq"))
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            F.col("vocab").alias("vocab_size"),
            "sum_clogq",
            (
                -(
                    F.col("sum_clogq").cast("double")
                    / (F.col("n").cast("double") * F.lit(10000.0))
                )
            ).alias("entropy_nats"),
        )
        .orderBy("source")
    )


_KL_ORACLE = """
WITH toks AS (
  SELECT source,
         UNNEST(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0)) AS term
  FROM documents
),
cnt_s AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st FROM toks GROUP BY source, term),
tot_s AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cnt_s GROUP BY source),
cnt_t AS (SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cnt_s GROUP BY term),
ntot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM cnt_s),
scored AS (
  SELECT s.source, s.c_st,
         CAST(floor(ln((CAST(s.c_st AS DOUBLE) * CAST(n.n AS DOUBLE)) / (CAST(t.n_s AS DOUBLE) * CAST(ct.c_t AS DOUBLE))) * 10000.0) AS BIGINT) AS logq
  FROM cnt_s s
  JOIN tot_s t USING (source)
  JOIN cnt_t ct USING (term)
  CROSS JOIN ntot n
)
SELECT s.source, t.n_s AS n_tokens,
       CAST(SUM(s.c_st * s.logq) AS BIGINT) AS sum_clogq,
       CAST(SUM(s.c_st * s.logq) AS DOUBLE) / (CAST(t.n_s AS DOUBLE) * 10000.0) AS kl_nats
FROM scored s JOIN tot_s t USING (source)
GROUP BY s.source, t.n_s
ORDER BY source
"""


@register("q_text_kl_divergence", oracle=_KL_ORACLE)
def q_text_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    whole-corpus distribution — the domain-drift score that flags a
    source whose language stopped looking like the mixture it feeds.

    100 TB shape: the per-source count table rolls up to the corpus
    table with one term-keyed partial agg; scoring joins are
    term-keyed equi-joins (vocab x vocab); per-source totals and the
    corpus total broadcast; the KL sum is an exact int64 partial agg
    (see entropy note)."""
    docs = load(spark, sf_dir, "documents")
    cnt_s = (
        docs.select("source", F.explode(T.tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_st"))
    )
    tot_s = cnt_s.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("n_s"))
    cnt_t = cnt_s.groupBy("term").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    ntot = cnt_s.agg(F.sum("c_st").cast("bigint").alias("n"))
    scored = (
        cnt_s.join(cnt_t, "term")
        .join(F.broadcast(tot_s), "source")
        .crossJoin(F.broadcast(ntot))
        .withColumn(
            # each factor casts to double BEFORE multiplying: the int64
            # products c_st*n and n_s*c_t are O(total_tokens^2) and
            # would wrap at ~10^13 tokens (round-6 advice); the
            # correctly-rounded double ratio is what ln needs, and the
            # identical expression runs in both engines
            "logq",
            F.expr(
                "CAST(floor(ln((CAST(c_st AS DOUBLE) * CAST(n AS DOUBLE))"
                " / (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE))) * 10000.0) AS BIGINT)"
            ),
        )
    )
    return (
        scored.groupBy("source", "n_s")
        .agg(F.sum(F.col("c_st") * F.col("logq")).cast("bigint").alias("sum_clogq"))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "sum_clogq",
            (
                F.col("sum_clogq").cast("double")
                / (F.col("n_s").cast("double") * F.lit(10000.0))
            ).alias("kl_nats"),
        )
        .orderBy("source")
    )


# --- Heaps-law vocabulary growth curve -------------------------------------

_HEAPS_ORACLE = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
toks AS (
  SELECT doc_id,
         CAST(least(doc_id * 10 // n.n_docs, 9) AS BIGINT) AS decile,
         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS t
  FROM documents CROSS JOIN n
),
exploded AS (SELECT decile, UNNEST(t) AS term FROM toks),
term_first AS (SELECT term, CAST(MIN(decile) AS BIGINT) AS first_decile FROM exploded GROUP BY term),
new_terms AS (
  SELECT first_decile AS decile, CAST(COUNT(*) AS BIGINT) AS n_new FROM term_first GROUP BY first_decile
),
tok_counts AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_toks FROM exploded GROUP BY decile
),
spine AS (SELECT CAST(UNNEST(range(0, 10)) AS BIGINT) AS decile)
SELECT s.decile,
       CAST(SUM(COALESCE(tc.n_toks, 0)) OVER (ORDER BY s.decile) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(nt.n_new, 0)) OVER (ORDER BY s.decile) AS BIGINT) AS cum_vocab
FROM spine s
LEFT JOIN new_terms nt USING (decile)
LEFT JOIN tok_counts tc USING (decile)
ORDER BY s.decile
"""


@register("q_text_heaps_curve", oracle=_HEAPS_ORACLE)
def q_text_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct vocabulary vs
    cumulative tokens over doc-id deciles of the corpus — the curve
    whose early flattening tells a data buyer the next shard of a
    source adds words, not repeats.

    100 TB shape: one explode pass feeds two vocab-sized partial aggs
    (first-decile per term, tokens per decile); the cumulative sums
    run over a TEN-row spine (a metadata window, not a data one);
    n_docs rides in broadcast."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    toks = docs.crossJoin(F.broadcast(n)).select(
        # exact integer floor division (`div`), mirroring the oracle's
        # `//`: a double true-division + truncation agrees at bench
        # scale but can land one decile off once doc_id*10 exceeds
        # ~2^52 (round-6 advice) — engine-independence must not
        # depend on double rounding
        F.least(F.expr("doc_id * 10 div n_docs"), F.lit(9).cast("bigint")).alias(
            "decile"
        ),
        F.explode(T.tokens("text")).alias("term"),
    )
    term_first = toks.groupBy("term").agg(
        F.min("decile").cast("bigint").alias("first_decile")
    )
    new_terms = term_first.groupBy(F.col("first_decile").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    tok_counts = toks.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks")
    )
    spine = spark.range(10).select(F.col("id").cast("bigint").alias("decile"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(new_terms, "decile", "left")
        .join(tok_counts, "decile", "left")
        .select(
            "decile",
            F.sum(F.coalesce(F.col("n_toks"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_vocab"),
        )
        .orderBy("decile")
    )


# --- Zipf's-law slope per source -------------------------------------------

_ZIPF_K = 100

# Shared double-arithmetic fragments: every cast/multiply/subtract is
# an IEEE correctly-rounded op on values both engines hold exactly
# (quantized-int sums), and BOTH engines evaluate the SAME expression
# string — so the fitted coefficients are bit-identical. Products are
# taken in doubles, never int64 (the q_text_kl_divergence overflow
# lesson: int64 cross-products of corpus-scale sums wrap at ~10^13
# tokens; double products merely round).
_ZIPF_SLOPE = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_ZIPF_ICEPT = (
    "((CAST(sy AS DOUBLE) - zipf_slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
    " / 10000.0"
)

_ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS t
  FROM documents
),
exploded AS (SELECT source, UNNEST(t) AS term FROM toks),
counts AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM exploded GROUP BY source, term
),
ranked AS (
  SELECT source, cnt,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rnk
  FROM counts
),
head AS (
  SELECT source,
         CAST(floor(ln(CAST(rnk AS DOUBLE)) * 10000.0) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 10000.0) AS BIGINT) AS y
  FROM ranked WHERE rnk <= {_ZIPF_K}
),
sums AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM head GROUP BY source
),
fit AS (SELECT source, n, sx, sy, {_ZIPF_SLOPE} AS zipf_slope FROM sums)
SELECT source, n AS n_terms, zipf_slope, {_ZIPF_ICEPT} AS ln_intercept
FROM fit
ORDER BY source
"""


@register("q_text_zipf", oracle=_ZIPF_ORACLE, python_stages="partial-top-k head cut before the regression")
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: regress quantized ln(term frequency)
    on quantized ln(rank) over each source's top-{k} terms. The slope
    (~-1 for natural language) is a fast corpus-health diagnostic — a
    source whose head is too flat (boilerplate-dominated) or too steep
    (token-spam) jumps out without reading a single document.

    100 TB shape: one token explode feeds a (source, term) partial-agg
    count (vocab-sized); the head cut is grouped_topk's bounded
    partial top-k, NOT a full window sort, so only {k} rows per source
    reach the regression; the fit itself is a 5-long partial agg per
    source. Quantized-int x/y make the sums order-independent (the
    _LM_LOGQ discipline); the top-{k} cap also bounds every
    cross-product far below int64 at any corpus size."""
    from corrie_spark.operators.similarity import grouped_topk

    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("source", F.explode(T.tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    head = grouped_topk(
        counts, _ZIPF_K, key_col="source", order_col="cnt", id_col="term"
    ).select(
        "source",
        F.expr("CAST(floor(ln(CAST(rnk AS DOUBLE)) * 10000.0) AS BIGINT)").alias("x"),
        F.expr("CAST(floor(ln(CAST(cnt AS DOUBLE)) * 10000.0) AS BIGINT)").alias("y"),
    )
    sums = head.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return (
        sums.withColumn("zipf_slope", F.expr(_ZIPF_SLOPE))
        .select(
            "source",
            F.col("n").alias("n_terms"),
            "zipf_slope",
            F.expr(_ZIPF_ICEPT.replace("CAST(n AS DOUBLE)", "CAST(n_terms AS DOUBLE)")).alias(
                "ln_intercept"
            ),
        )
        .orderBy("source")
    )


# --- weighted reservoir sample (Efraimidis-Spirakis A-ES) ------------------

_WRS_K = 10

# 52-bit md5-derived uniform: h in [0, 2^52) is exactly representable
# as a double, so u = (h + 1) / 2^52 in (0, 1] is ONE correctly-
# rounded IEEE division of exact values — identical in every engine.
# A-ES key: ln(u) / w; top-k by key == weight-proportional sample
# without replacement. The key is quantized to an int (the _LM_LOGQ
# discipline) so ranking never depends on engine float comparison
# subtleties; ties (measure-zero) break on doc_id via grouped_topk.
_WRS_H52 = "CAST('0x' || substr(md5('wrs:' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)"
_WRS_KEY = (
    "CAST(floor((ln((CAST(h AS DOUBLE) + 1.0) / 4503599627370496.0)"
    " / CAST(w AS DOUBLE)) * -1000000.0) AS BIGINT)"
)

_WRS_ORACLE = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         {_WRS_H52} AS h,
         CAST(n_chars + 1 AS BIGINT) AS w
  FROM documents
),
scored AS (
  SELECT source, doc_id, n_chars, {_WRS_KEY} AS neg_key FROM keyed
),
ranked AS (
  SELECT source, doc_id, n_chars, neg_key,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY neg_key, doc_id) AS rnk
  FROM scored
)
SELECT source, doc_id, CAST(rnk AS BIGINT) AS rnk, neg_key, n_chars
FROM ranked WHERE rnk <= {_WRS_K}
ORDER BY source, rnk
"""


@register("q_mix_weighted_sample", oracle=_WRS_ORACLE, python_stages="partial-top-k consumer (A-ES keys)")
def q_mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement, {k} docs per
    source, weight = n_chars + 1 (longer docs proportionally more
    likely) — the Efraimidis-Spirakis reservoir scheme with the
    "random" replaced by a deterministic md5-derived uniform: the
    sample is a pure function of doc_id, reproducible across runs,
    engines, and cluster sizes (same contract as the hash split and
    stratified sample), yet distributionally exactly the A-ES
    weighted draw. The mix op df.sample() can't express: quality- or
    length-weighted subcorpus draws for data-mix ablations.

    100 TB shape: key computation is a pure projection; the per-source
    top-k is grouped_topk's bounded partial merge (only {k} rows per
    source per partition reach the exchange) — no full sort, no
    corpus shuffle."""
    from corrie_spark.operators.similarity import grouped_topk

    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string"))), 1, 13
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
        (F.col("n_chars") + 1).cast("bigint").alias("w"),
    )
    scored = keyed.select(
        "source", "doc_id", "n_chars", F.expr(_WRS_KEY).alias("neg_key")
    )
    # grouped_topk ranks by order_col DESC; A-ES wants the LARGEST
    # ln(u)/w, i.e. the smallest quantized negation -> order by
    # -neg_key descending
    return (
        grouped_topk(
            scored.withColumn("ord", -F.col("neg_key")),
            _WRS_K,
            key_col="source",
            order_col="ord",
            id_col="doc_id",
            carry=("neg_key", "n_chars"),
        )
        .select("source", "doc_id", "rnk", "neg_key", "n_chars")
        .orderBy("source", "rnk")
    )


# --- least-squares quality-classifier distillation -------------------------

# Label: the q_corpus_filter thresholds reformulated as integer-exact
# comparisons (stop-ratio >= 0.03 <=> 100*n_stop >= 3*n_tok,
# punct-ratio <= 0.2 <=> 5*n_punct <= n_chars, mean token length in
# [2, 10] <=> 2*n_tok <= tok_chars <= 10*n_tok).
_LSC_LABEL = (
    f"CASE WHEN ({_NTOK}) BETWEEN 10 AND 500"
    f" AND 100 * ({_NSTOP}) >= 3 * ({_NTOK})"
    f" AND 5 * ({_NPUNCT}) <= length(text)"
    f" AND 2 * ({_NTOK}) <= ({_NTOKCHARS})"
    f" AND ({_NTOKCHARS}) <= 10 * ({_NTOK}) THEN 1 ELSE -1 END"
)

_LSC_SUMS = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
       CAST(SUM(x1 * x1) AS BIGINT) AS s11, CAST(SUM(x1 * x2) AS BIGINT) AS s12,
       CAST(SUM(x2 * x2) AS BIGINT) AS s22,
       CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x1 * y) AS BIGINT) AS s1y, CAST(SUM(x2 * y) AS BIGINT) AS s2y
FROM (SELECT {_LSC_LABEL} AS y, {_NTOK} AS x1, {_NSTOP} AS x2 FROM documents)
"""

_LSC_FIT_CTE = f"""sums AS ({_LSC_SUMS}),
fit AS (
  SELECT n,
         CAST({_det3(_ols_repl(0))} AS DOUBLE) / CAST({_det3(_OLS_A)} AS DOUBLE) AS beta0,
         CAST({_det3(_ols_repl(1))} AS DOUBLE) / CAST({_det3(_OLS_A)} AS DOUBLE) AS beta1,
         CAST({_det3(_ols_repl(2))} AS DOUBLE) / CAST({_det3(_OLS_A)} AS DOUBLE) AS beta2
  FROM sums
)"""

_LSC_ORACLE = f"""
WITH {_LSC_FIT_CTE},
scored AS (
  SELECT f.beta0, f.beta1, f.beta2, f.n,
         CASE WHEN ({_LSC_LABEL}) * (f.beta0 + f.beta1 * ({_NTOK}) + f.beta2 * ({_NSTOP})) > 0
              THEN 1 ELSE 0 END AS correct
  FROM documents CROSS JOIN fit f
)
SELECT any_value(n) AS n_docs,
       any_value(beta0) AS beta0, any_value(beta1) AS beta1, any_value(beta2) AS beta2,
       CAST(SUM(correct) AS BIGINT) AS n_correct,
       CAST(SUM(correct) AS DOUBLE) / CAST(any_value(n) AS DOUBLE) AS accuracy
FROM scored
"""


def _lsc_fit(spark: SparkSession, sf_dir: str):
    """Shared trainer for the distilled quality classifier: the
    (y, x1, x2) feature frame and the exact-OLS fit (integer power
    sums -> big-int Cramer solve -> IEEE doubles). Serves
    q_text_ls_classifier (accuracy dashboard) and
    q_text_quality_report (per-class P/R/F1). Session-memoized (the
    _pq_index discipline): the training aggregate+collect ran on
    EVERY call from both consumers before; the fit is deterministic
    exact-integer arithmetic, so memoized betas == retrained betas
    bit-identically."""
    from corrie_spark.queries.dedup_queries import _memo

    return _memo(spark, sf_dir, "lsc_fit", lambda: _lsc_fit_build(spark, sf_dir))


def _lsc_fit_build(spark: SparkSession, sf_dir: str):
    from corrie_spark.functions import bind

    docs = load(spark, sf_dir, "documents")
    nt = T.token_count("text").cast("bigint")
    ns = T.stopword_count("text").cast("bigint")
    np_ = T.punct_count("text").cast("bigint")
    nc = F.length("text").cast("bigint")
    ntc = F.when(F.length(F.trim("text")) == 0, F.lit(0).cast("bigint")).otherwise(
        bind(
            T.tokens("text"),
            lambda t: F.aggregate(
                F.transform(t, lambda x: F.length(x).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ),
        )
    )
    y = F.when(
        nt.between(10, 500)
        & (100 * ns >= 3 * nt)
        & (5 * np_ <= nc)
        & (2 * nt <= ntc)
        & (ntc <= 10 * nt),
        1,
    ).otherwise(-1)
    f = docs.select(y.alias("y"), nt.alias("x1"), ns.alias("x2"))
    r = (
        f.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x1").alias("sx1"),
            F.sum("x2").alias("sx2"),
            F.sum(F.col("x1") * F.col("x1")).alias("s11"),
            F.sum(F.col("x1") * F.col("x2")).alias("s12"),
            F.sum(F.col("x2") * F.col("x2")).alias("s22"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x1") * F.col("y")).alias("s1y"),
            F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        )
        .collect()[0]
    )
    s = {k: int(r[k]) for k in r.asDict()}
    det = _det3([[s[v] for v in row] for row in _OLS_A])
    betas = [
        float(_det3([[s[v] for v in row] for row in _ols_repl(i)])) / float(det)
        for i in range(3)
    ]
    return f, betas


@register("q_text_ls_classifier", oracle=_LSC_ORACLE)
def q_text_ls_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares quality classifier trained IN-ENGINE: distill the
    rule-based corpus filter into a linear scorer sign(b0 + b1*n_tok +
    b2*n_stop) by regressing the ±1 rule label on the raw counts (the
    classic bootstrap for a learned quality classifier: heuristic
    labels, cheap features — the model must rediscover the filter's
    engineered stop-ratio from raw counts, and does: train accuracy
    beats the majority-class baseline, pinned by test).

    Training is the exact-OLS machinery (q_ols_doc_length): ONE 9-long
    partial aggregation of integer power sums, big-int Cramer solve on
    the driver, coefficients emitted by the identical HUGEINT->DOUBLE
    cast sequence as the oracle. Scoring is a second one-pass agg with
    the fitted doubles folded in as literals (shortest-roundtrip repr
    parses back to the identical IEEE double in both engines), so the
    reported accuracy is bit-exact too."""
    f, betas = _lsc_fit(spark, sf_dir)
    score = f"(y * ({betas[0]!r}D + {betas[1]!r}D * x1 + {betas[2]!r}D * x2)) > 0"
    return f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.lit(betas[0]).alias("beta0"),
        F.lit(betas[1]).alias("beta1"),
        F.lit(betas[2]).alias("beta2"),
        F.sum(F.when(F.expr(score), 1).otherwise(0)).cast("bigint").alias("n_correct"),
        (
            F.sum(F.when(F.expr(score), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("accuracy"),
    )


_QR_PAIRS_CTE = f"""{_LSC_FIT_CTE},
pairs AS (
  SELECT CASE WHEN ({_LSC_LABEL}) = 1 THEN 'keep' ELSE 'drop' END AS label_cls,
         CASE WHEN (f.beta0 + f.beta1 * ({_NTOK}) + f.beta2 * ({_NSTOP})) > 0
              THEN 'keep' ELSE 'drop' END AS pred_cls
  FROM documents CROSS JOIN fit f
)"""

_QUALITY_REPORT_ORACLE = _report_sql(_QR_PAIRS_CTE, "label_cls", "pred_cls")


@register("q_text_quality_report", oracle=_QUALITY_REPORT_ORACLE)
def q_text_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class P/R/F1 for the DISTILLED quality classifier — the
    evaluation the accuracy dashboard (q_text_ls_classifier) can't
    give: accuracy hides that a 90/10 keep/drop corpus rewards
    predicting 'keep' always; the report shows the drop-class recall
    the filter actually needs. Composes the two in-engine layers —
    the exact-OLS trainer (shared _lsc_fit, replayed by the oracle's
    Cramer CTE) and the classification-report operator — in one
    statement; the oracle replays BOTH through one SQL program.
    Scale: training is the one 9-long power-sum agg, scoring+matrix
    is one groupBy with the fitted doubles folded in as literals,
    report joins are 2-class-sized."""
    from corrie_spark.operators import evaluation as EV

    f, betas = _lsc_fit(spark, sf_dir)
    keep = f"({betas[0]!r}D + {betas[1]!r}D * x1 + {betas[2]!r}D * x2) > 0"
    pairs = f.select(
        F.when(F.col("y") == 1, "keep").otherwise("drop").alias("label_cls"),
        F.when(F.expr(keep), "keep").otherwise("drop").alias("pred_cls"),
    )
    return EV.classification_report(pairs, "label_cls", "pred_cls")


# --- chat-template rendering + loss-mask spans (SFT prep) -------------------

_CHAT_SYS = "You are a helpful assistant."

_CHAT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
lns AS (
  SELECT doc_id,
    list_transform(range(0, (len(t) + 7) // 8),
      i -> array_to_string(list_slice(t, i * 8 + 1, i * 8 + 8), ' ')) AS ls,
    1 + doc_id % 3 AS n
  FROM toks WHERE len(t) > 0
),
built AS (
  SELECT doc_id, n,
    '<|system|>' || chr(10) || '{_CHAT_SYS}' || '<|end|>' || chr(10) AS sys_part,
    ls
  FROM lns
),
parts AS (
  SELECT doc_id, n, sys_part, ls,
    list_transform(range(0, n), j ->
      '<|user|>' || chr(10) || ls[(j % len(ls)) + 1] || '<|end|>' || chr(10) ||
      '<|assistant|>' || chr(10) || 'Echo: ' || ls[(j % len(ls)) + 1] ||
      '<|end|>' || chr(10)) AS rounds
  FROM built
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_turns,
  md5(sys_part || array_to_string(rounds, '')) AS render_md5,
  CAST(length(sys_part || array_to_string(rounds, '')) AS BIGINT) AS n_chars,
  md5(array_to_string(
    list_transform(range(0, n), i ->
      CAST(length(sys_part ||
             COALESCE(array_to_string(list_slice(rounds, 1, i), ''), '') ||
             '<|user|>' || chr(10) || ls[(i % len(ls)) + 1] ||
             '<|end|>' || chr(10) || '<|assistant|>' || chr(10))
           AS VARCHAR)
      || ':' ||
      CAST(length(sys_part ||
             COALESCE(array_to_string(list_slice(rounds, 1, i), ''), '') ||
             '<|user|>' || chr(10) || ls[(i % len(ls)) + 1] ||
             '<|end|>' || chr(10) || '<|assistant|>' || chr(10) ||
             'Echo: ' || ls[(i % len(ls)) + 1])
           AS VARCHAR)),
    '|')) AS spans_md5
FROM parts
"""


def _rendered_chat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the rendered-conversation frame
    (doc_id, _s, _spans, n_chars) — the chat_fold aggregate (a wide
    interpreted HOF fold) feeds BOTH q_chat_render and q_chat_pack,
    so it renders once per session (the `_shared_sigs` discipline)
    and both serving paths probe the checkpointed frame. The fold is
    deterministic row-local arithmetic: memoized == inline
    bit-identically, and both consumers' oracles restate the rendered
    string closed-form either way."""
    from corrie_spark.functions.core import bind
    from corrie_spark.operators import chat as C
    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        toks_e = F.filter(F.split("text", " "), lambda t: t != "")

        def with_lines(toks):
            n_lines = F.ceil(F.size(toks) / F.lit(8)).cast("int")
            return F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * 8 + 1, 8), " "
                ),
            )

        def build_messages(ls):
            n = (F.col("doc_id") % 3 + 1).cast("int")

            def li(i):
                return F.element_at(
                    ls, (i % F.size(ls) + 1).cast("int")
                )

            rounds = F.flatten(
                F.transform(
                    F.sequence(F.lit(0), n - 1),
                    lambda i: F.array(
                        F.struct(
                            F.lit("user").alias("role"),
                            li(i).alias("content"),
                        ),
                        F.struct(
                            F.lit("assistant").alias("role"),
                            F.concat(F.lit("Echo: "), li(i)).alias("content"),
                        ),
                    ),
                )
            )
            return F.concat(
                F.array(
                    F.struct(
                        F.lit("system").alias("role"),
                        F.lit(_CHAT_SYS).alias("content"),
                    )
                ),
                rounds,
            )

        msgs = bind(bind(toks_e, with_lines), build_messages)
        fold = bind(msgs, C.chat_fold)
        return (
            docs.where(F.size(toks_e) > 0)
            .select(
                "doc_id",
                fold["s"].alias("_s"),
                fold["spans"].alias("_spans"),
            )
            .withColumn("n_chars", F.length("_s").cast("long"))
            .localCheckpoint(eager=True)
        )

    return _memo(spark, sf_dir, "rendered_chat", build)


@register("q_chat_render", oracle=_CHAT_ORACLE)
def q_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-data prep end-to-end: per document a deterministic
    multi-turn conversation (system + 1..3 user/assistant rounds over
    the 8-word fixture lines, assistant echoing), rendered through the
    REAL chat_fold operator — one JVM aggregate producing the training
    string AND the assistant-content loss-mask spans in the same fold.
    The oracle restates the rendered string and every span boundary
    closed-form by prefix-length arithmetic, so template layout, span
    starts/ends and turn cycling are all value-gated. Scale: pure
    Column expressions, row-local, a free rider on the corpus scan;
    the rendered frame itself rides the session memo shared with
    q_chat_pack."""
    from corrie_spark.operators import chat as C

    rendered = _rendered_chat(spark, sf_dir)
    return rendered.select(
        "doc_id",
        ((F.col("doc_id") % 3) + 1).cast("long").alias("n_turns"),
        F.md5(F.col("_s")).alias("render_md5"),
        F.col("n_chars"),
        F.md5(C.spans_fingerprint(F.col("_spans"))).alias("spans_md5"),
    )


# --- fill-in-the-middle transformation (code-model training) ----------------

# exact-int split points: lo = len*(id%5) DIV 10, hi = len*(id%5+3) DIV 10
_FIM_ORACLE = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         (length(text) * (doc_id % 5)) // 10 AS lo,
         (length(text) * (doc_id % 5 + 3)) // 10 AS hi
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
  md5('<|fim_prefix|>' || substring(text, 1, lo) ||
      '<|fim_suffix|>' || substring(text, hi + 1, n - hi) ||
      '<|fim_middle|>' || substring(text, lo + 1, hi - lo)) AS fim_md5,
  CAST(n + 42 AS BIGINT) AS n_chars,
  CAST(hi - lo AS BIGINT) AS middle_len
FROM d
"""


@register("q_text_fim", oracle=_FIM_ORACLE)
def q_text_fim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle (PSM) transformation through the real
    operator: per document an exact-int split window ([len*(id%5)/10,
    len*(id%5+3)/10), integer division both engines) renders
    prefix/suffix/middle under the FIM sentinels. The oracle restates
    the transformed string closed-form with the same substring
    arithmetic, so sentinel layout, boundary indexing (1-based
    substring, end-exclusive middle) and length conservation (n + 3
    sentinels = 42 chars) are value-gated. Row-local JVM projection."""
    from corrie_spark.operators import chat as C

    docs = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    # exact INTEGER division on both engines (Spark `div` == DuckDB `//`)
    lo = F.expr("(length(text) * (doc_id % 5)) div 10")
    hi = F.expr("(length(text) * (doc_id % 5 + 3)) div 10")
    fim = C.fim_transform(F.col("text"), lo, hi)
    return docs.select(
        "doc_id",
        F.md5(fim).alias("fim_md5"),
        F.length(fim).cast("long").alias("n_chars"),
        (hi - lo).cast("long").alias("middle_len"),
    )


# --- packed chat sequences: spans re-based into shard coordinates -----------

_CHATPACK_BUDGET = 4000  # chars per packed training sequence

_CHATPACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
lns AS (
  SELECT doc_id,
    list_transform(range(0, (len(t) + 7) // 8),
      i -> array_to_string(list_slice(t, i * 8 + 1, i * 8 + 8), ' ')) AS ls,
    1 + doc_id % 3 AS n
  FROM toks WHERE len(t) > 0
),
rend AS (
  SELECT doc_id,
    '<|system|>' || chr(10) || '{_CHAT_SYS}' || '<|end|>' || chr(10) AS sys_part,
    ls, n,
    length('<|system|>' || chr(10) || '{_CHAT_SYS}' || '<|end|>' || chr(10) ||
      array_to_string(list_transform(range(0, n), j ->
        '<|user|>' || chr(10) || ls[(j % len(ls)) + 1] || '<|end|>' || chr(10) ||
        '<|assistant|>' || chr(10) || 'Echo: ' || ls[(j % len(ls)) + 1] ||
        '<|end|>' || chr(10)), '')) AS n_chars,
    length('<|system|>' || chr(10) || '{_CHAT_SYS}' || '<|end|>' || chr(10) ||
      '<|user|>' || chr(10) || ls[1] || '<|end|>' || chr(10) ||
      '<|assistant|>' || chr(10)) AS first_start,
    ('0x' || substr(md5('chatpack:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM lns
),
c AS (
  SELECT doc_id, n_chars, first_start, h,
         COALESCE(SUM(n_chars) OVER (ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM rend
),
s AS (
  SELECT *,
         CAST(floor(cum_before / {_CHATPACK_BUDGET}.0) AS BIGINT) AS shard,
         cum_before - MIN(cum_before) OVER (
           PARTITION BY CAST(floor(cum_before / {_CHATPACK_BUDGET}.0) AS BIGINT)
         ) AS off
  FROM c
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
       md5(string_agg(
         CAST(doc_id AS VARCHAR) || ':' || CAST(off AS VARCHAR) || ':' ||
         CAST(off + first_start AS VARCHAR), '|' ORDER BY h)) AS layout_md5
FROM s
GROUP BY shard
"""


@register("q_chat_pack", oracle=_CHATPACK_ORACLE)
def q_chat_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing COMPOSED with chat rendering: each document's
    rendered conversation (chat_fold) packs into ~4000-char training
    sequences via the two-phase distributed prefix sum, and every
    document's FIRST assistant loss-mask span re-bases into packed
    coordinates (offset_in_shard + span start). The oracle replays the
    hash order, the naive global-window prefix sum, the shard split,
    the in-shard offsets AND the re-based span starts closed-form —
    the full chain a packed-SFT data loader depends on. Scale: the
    prefix sum is the distributed one (never a single-partition
    window); the min-offset window rides the shard exchange. The
    rendered (doc_id, _s, _spans, n_chars) frame rides the session
    memo shared with q_chat_render (checkpointed, so the cumsum's two
    consumers probe it instead of re-running the fold lineage)."""
    from corrie_spark.operators.packing import pack_with_offsets

    rendered = _rendered_chat(spark, sf_dir)
    packed = pack_with_offsets(
        rendered, "doc_id", "n_chars", budget=_CHATPACK_BUDGET,
        salt="chatpack",
    )
    # re-base the first assistant span into packed coordinates
    first_start = (
        F.col("offset_in_shard") + F.element_at("_spans", 1)["start"]
    ).cast("long")
    layout = F.concat_ws(
        ":",
        F.col("doc_id").cast("string"),
        F.col("offset_in_shard").cast("string"),
        first_start.cast("string"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("_h").alias("h"),
                                             layout.alias("l")))),
        lambda s: s["l"],
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("shard_chars"),
            F.md5(F.array_join(ordered, "|")).alias("layout_md5"),
        )
    )


# --- sentence segmentation ---------------------------------------------------

_SENT_ORACLE_TMPL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
lns AS (
  SELECT doc_id,
    list_transform(range(0, (len(t) + 7) // 8),
      i -> array_to_string(list_slice(t, i * 8 + 1, i * 8 + 8), ' ')) AS ls
  FROM toks WHERE len(t) > 0
),
src AS (
  SELECT doc_id,
    array_to_string(list_transform(range(0, len(ls)),
      i -> ls[i + 1] ||
           ['. ', '! ', '? '][((doc_id + i) % 3) + 1]), '') AS s
  FROM lns
)
SELECT doc_id,
       CAST(len({SENT}) AS BIGINT) AS n_sentences,
       md5(array_to_string({SENT}, '|')) AS sent_md5
FROM src
"""


def _sent_oracle() -> str:
    from corrie_spark.operators import web as Wb

    return _SENT_ORACLE_TMPL.replace("{SENT}", Wb.sentences_sql("s"))


@register("q_text_sentences", oracle=_sent_oracle())
def q_text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based sentence segmentation (packing/chunking/sentence-
    level-dedup food): per document a deterministically punctuated
    source string (fixture lines terminated by rotating . ! ?), split
    by the SAME regex chain in both engines — the Java-vs-RE2
    agreement gate, the q_web_html_text shape. Row-local projection,
    free rider on the scan."""
    from corrie_spark.functions.core import bind
    from corrie_spark.operators import web as Wb

    docs = load(spark, sf_dir, "documents")
    toks_e = F.filter(F.split("text", " "), lambda t: t != "")

    def with_lines(toks):
        n_lines = F.ceil(F.size(toks) / F.lit(8)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
        )

    def mk_src(ls):
        terms = F.array(F.lit(". "), F.lit("! "), F.lit("? "))
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.size(ls) - 1),
                lambda i: F.concat(
                    F.element_at(ls, (i + 1).cast("int")),
                    F.element_at(
                        terms,
                        ((F.col("doc_id") + i) % 3 + 1).cast("int"),
                    ),
                ),
            ),
            "",
        )

    src = bind(bind(toks_e, with_lines), mk_src)
    sent = bind(src, Wb.sentences)
    return docs.where(F.size(toks_e) > 0).select(
        "doc_id",
        F.size(sent).cast("long").alias("n_sentences"),
        F.md5(F.array_join(sent, "|")).alias("sent_md5"),
    )


# --- DSIR importance reweighting through the oracle gate --------------------

_DSIR_B = T.DSIR_BUCKETS
_DSIR_S = T.DSIR_SCALE

_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_target,
    CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS t
  FROM documents
),
grams AS (
  SELECT doc_id, is_target,
    unnest(list_concat(t, {_BIGRAMS})) AS g
  FROM toks
),
bk AS MATERIALIZED (
  SELECT doc_id, is_target,
    ('0x' || substr(md5('dsir:' || g), 1, 15))::BIGINT % {_DSIR_B} AS b
  FROM grams
),
wt AS (
  SELECT b,
    ({_DSIR_S} * (SUM(CASE WHEN is_target THEN 1 ELSE 0 END) + 1))
      // (COUNT(*) + 1) AS w
  FROM bk GROUP BY b
),
sc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(w) AS BIGINT) AS score
  FROM bk JOIN wt USING (b) GROUP BY doc_id
)
SELECT d.doc_id, d.is_target,
  COALESCE(sc.n_grams, 0) AS n_grams,
  COALESCE(sc.score, 0) AS score
FROM (SELECT DISTINCT doc_id, is_target FROM toks) d
LEFT JOIN sc USING (doc_id)
"""


@register("q_text_dsir_scores", oracle=_DSIR_ORACLE)
def q_text_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023) through the oracle
    gate: hashed unigram+bigram bucket frequencies fit over the
    lang='en' target subset vs the whole corpus, every document
    scored by the exact integer sum of its grams' integer-rational
    weights (scale*(t+1) div (r+1) — the determinism-contract stand-in
    for the paper's log-ratio; see operators/text.py dsir_scores).
    Two corpus passes (fit then apply), broadcast weight table, gram
    strings never shuffle."""
    docs = load(spark, sf_dir, "documents")
    return T.dsir_scores(docs, target=F.col("lang") == "en")
