"""Text-analysis operators for training-data pipelines.

All operators are pure Column expressions (JVM-side, whole-stage
codegen; no Python UDFs) so they run at full scan speed over 100 TB:
a document passes through tokenize/quality/langid/fingerprint in one
projection, no shuffle at all.

Determinism contract: each operator has an exact ANSI-SQL equivalent
(used by the DuckDB oracle in queries/text_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from corrie_spark.functions.core import bind

# shared with the oracle SQL — keep both lists in sync
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # pinyin-romanized markers
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def word_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: word pieces and single non-space
    punctuation, the usual `\\w+|[^\\w\\s]` regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), 0)


def stopword_count(text: Column | str, words: list[str] | None = None) -> Column:
    ws = words or STOPWORDS
    # one array literal in one py4j call (lit accepts lists), not one
    # round trip per word — plans are rebuilt per run, so literal
    # construction is on the serving path
    lit_ws = F.lit(list(ws))
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lit_ws, F.lower(t))))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))


def quality_features(text: Column | str) -> Column:
    """Quality-scoring feature struct: n_chars, n_tokens,
    mean_token_len, stopword_ratio, punct_ratio, alpha_ratio.
    Ratios are double divisions of exact ints -> deterministic."""
    c = F.col(text) if isinstance(text, str) else text

    # tokenization is bound to a lambda variable so it is evaluated
    # once per row however many fields reference it (Catalyst inlines
    # sub-expressions per reference otherwise)
    def build(toks: Column) -> Column:
        lit_stop = F.lit(list(STOPWORDS))
        n_chars = F.length(c)
        n_tokens = F.size(toks)
        n_token_chars = F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        )
        n_stop = F.size(F.filter(toks, lambda t: F.array_contains(lit_stop, F.lower(t))))
        n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
        safe_tokens = F.greatest(n_tokens, F.lit(1))
        safe_chars = F.greatest(n_chars, F.lit(1))
        return F.struct(
            n_chars.alias("n_chars"),
            n_tokens.alias("n_tokens"),
            (n_token_chars.cast("double") / safe_tokens).alias("mean_token_len"),
            (n_stop.cast("double") / safe_tokens).alias("stopword_ratio"),
            (punct_count(c).cast("double") / safe_chars).alias("punct_ratio"),
            (n_alpha.cast("double") / safe_chars).alias("alpha_ratio"),
        )

    return bind(tokens(c), build)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1]-ish quality score: rewards stopword presence and
    sane token lengths, penalizes punctuation soup. Weights are fixed
    constants shared with the oracle."""
    # the features struct is itself bound: the five field references
    # would otherwise each re-evaluate the full feature pipeline
    return bind(quality_features(text), quality_score_from)


def quality_score_from(f: Column) -> Column:
    """quality_score over an already-evaluated features struct (use
    when the caller binds quality_features once and derives several
    outputs from the same struct)."""
    length_ok = F.when(
        (f["n_tokens"] >= 5) & (f["mean_token_len"] >= 2) & (f["mean_token_len"] <= 12),
        F.lit(1.0),
    ).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * length_ok
        + F.lit(0.3) * F.least(f["stopword_ratio"] * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(f["punct_ratio"] * 5, F.lit(1.0)))
    )


def token_stop_counts(text: Column | str) -> Column:
    """(n_tokens, n_stop) as one struct from a single tokenization —
    the fused form of token_count + stopword_count for callers that
    need both (each alone re-splits the text)."""

    def build(toks: Column) -> Column:
        lit_stop = F.lit(list(STOPWORDS))
        return F.struct(
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.size(
                F.filter(toks, lambda t: F.array_contains(lit_stop, F.lower(t)))
            ).cast("bigint").alias("n_stop"),
        )

    return bind(tokens(text), build)


def lang_scores(text: Column | str) -> Column:
    """Per-language marker-hit counts as a struct of ints."""
    def build(toks: Column) -> Column:
        fields = []
        for lang, markers in LANG_MARKERS.items():
            lit_ws = F.lit(list(markers))
            fields.append(
                F.size(F.filter(toks, lambda t: F.array_contains(lit_ws, F.lower(t)))).alias(lang)
            )
        return F.struct(*fields)

    # one tokenization for all five language counters (bound lambda
    # variable; Catalyst would otherwise re-split per language)
    return bind(tokens(text), build)


def detect_lang(text: Column | str, min_hits: int = 1) -> Column:
    """argmax over lang_scores with deterministic tie-break (first in
    LANG_MARKERS order); below min_hits -> 'und'."""
    def fold(s: Column) -> Column:
        best = F.lit("und")
        best_score = F.lit(min_hits - 1)
        # forward fold with strict '>' -> first language in LANG_MARKERS
        # order wins ties (matches the oracle's CASE chain)
        for lang in LANG_MARKERS:
            score = s[lang]
            best = F.when(score > best_score, F.lit(lang)).otherwise(best)
            best_score = F.greatest(score, best_score)
        return best

    # the scores struct is bound so the argmax fold's ~2 references per
    # language read one materialized struct instead of re-counting
    return bind(lang_scores(text), fold)


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum
    (keeping spaces), collapse runs of whitespace, trim."""
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text. Stable across
    engines (md5 is md5); used as the exact-dedup key."""
    return F.md5(normalize_text(text))


def prefix_fingerprint(text: Column | str, k: int = 8) -> Column:
    """md5 of the first `k` whitespace tokens — the boilerplate/
    header-prefix dedup key (crawled pages sharing a template open
    identically long before their bodies diverge). Deliberately
    coarser than `fingerprint`: collides for documents that merely
    START alike, which is the point for incremental near-dedup
    screening. Empty/blank text hashes the empty string in both
    engines (tokens() -> [] -> concat_ws '' here; trim-then-split
    joins back to '' in the oracle)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(text), 1, k)))


# Rolling-hash parameters. MOD = 2^31-1 keeps acc*BASE + h < 2^39,
# far inside int64 — no overflow in either engine.
ROLLING_MOD = 2_147_483_647
ROLLING_BASE = 131


def rolling_hash(text: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over whitespace tokens:
    fold acc -> (acc*BASE + h(tok)) mod MOD, h = 60-bit md5 prefix
    mod MOD. Unlike `fingerprint` (order-insensitive after normalize,
    md5 of the whole text) this is incremental — the building block
    for windowed / streaming fingerprints. Pure fold over the
    row-local token array: map-stage only at any scale."""
    from corrie_spark.operators.dedup import hash60

    return F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * ROLLING_BASE + hash60(t) % ROLLING_MOD) % ROLLING_MOD,
    )


def winnow_fingerprint(text: Column | str, k: int = 5) -> Column:
    """Winnowing-style robust fingerprint: minimum hash over word
    k-gram shingles (the MOSS min-selection idea collapsed to window =
    whole doc). Stable under small edits anywhere outside the minimal
    shingle; docs with < k tokens fall back to one whole-text shingle
    (see dedup.shingles)."""
    from corrie_spark.operators.dedup import hash60, shingles

    return F.array_min(
        F.transform(shingles(text, k), lambda s: hash60(s) % ROLLING_MOD)
    )


# --- PII scrubbing ----------------------------------------------------------

# Patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded quantifiers, \b only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_counts(text: Column | str) -> Column:
    """struct(n_emails, n_phones) found in the text — the audit pass a
    corpus scrub reports before/after. Row-local, zero shuffle."""
    t = F.col(text) if isinstance(text, str) else text
    return F.struct(
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
    )


def scrub_pii(text: Column | str) -> Column:
    """Redact emails then phone numbers with fixed tags — the standard
    pre-training scrub step. regexp_replace replaces every occurrence;
    email runs first so a phone inside a local-part cannot resurface."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )


# --- DSIR-style hashed importance reweighting -------------------------------

DSIR_BUCKETS = 2048
DSIR_SCALE = 1 << 20


def dsir_scores(
    docs,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
):
    """Hashed n-gram importance scores toward a TARGET distribution —
    the data-selection shape of Xie et al. 2023 ("Data Selection for
    Language Models via Importance Resampling", public paper):
    featurize every document as hashed unigram+bigram counts, fit
    bucket frequencies over the target subset vs the whole corpus,
    and score each document by how target-like its grams are. Rows:
    (id, is_target, n_grams, score).

    Determinism contract (the repo-wide rule: never sum doubles
    across rows): the paper's per-bucket log(p/q) weight is replaced
    by the integer-rational weight

        w_b = (scale * (t_b + 1)) div (r_b + 1)

    (add-one smoothing; t_b = target count, r_b = corpus count), and
    a document's score is the EXACT integer sum of its grams' weights
    — monotone in the same target/corpus ratio the paper ranks by,
    replayable closed-form by the SQL oracle, and stable under any
    row order. Hashing is the cross-engine md5 family (hash60 mod
    n_buckets, salt 'dsir').

    100 TB shape: ONE pass over the corpus (round-14; previously the
    fit/apply split re-ran the md5 gram hash once per side): gram
    occurrences partial-aggregate map-side to (_id, is_target, bucket,
    count) rows — longs, never gram strings — the per-bucket fit
    totals are window sums over the bucket partition, and documents
    reduce with exact-int count-weighted sums. Shuffles carry counted
    longs; the heavy hash subtree runs exactly once; no driver-side
    loops."""
    from corrie_spark.functions import bind
    from corrie_spark.operators.dedup import hash60

    # Guide §2.5 (input skew — one unsplittable file): the gram
    # explode + per-gram md5 below is the dominant cost and runs
    # BEFORE any exchange, so a narrow scan (tiny corpora read as one
    # parquet split) would hash on one core. Spread the rows first;
    # no-op whenever the input is already at least core-parallel
    # (any real-scale corpus), so nothing is re-shuffled at 100 TB.
    # Measured at sf0.1: 2.1-3.1 s -> 1.4-2.1 s, rows identical.
    from corrie_spark.tables import spread

    docs = spread(docs)

    toks_raw = F.split(F.trim(F.col(text_col)), "\\s+")
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(toks_raw)

    def grams_of(t: Column) -> Column:
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
        return F.concat(t, bigrams)

    base = docs.select(
        F.col(id_col).alias("_id"),
        target.alias("is_target"),
        bind(toks, grams_of).alias("_grams"),
    )
    # One pass over the md5-hashed gram stream (round-14): the fit and
    # the apply previously each re-ran the explode+hash subtree
    # (Catalyst does not share it across the weights agg and the join),
    # doubling the dominant md5 cost. Instead: partial-aggregate gram
    # occurrences to (_id, is_target, bucket, _c) — map-side combine
    # shuffles counts, not gram rows — then state each bucket's global
    # (_r, _t) with window sums over the bucket partition (exactly the
    # fit totals: _r = sum of _c, _t = sum of target _c), and reduce
    # per document with _c-weighted sums. Bit-identical to the
    # fit/apply split; the gram hash is computed ONCE.
    # explode_outer keeps zero-gram docs as one (_g = NULL, _c = 0)
    # row routed to the sentinel bucket -1, so per-doc aggregation
    # covers EVERY document and the old left-join back to a second
    # docs scan disappears (guide §2.4: one scan, one exchange fewer)
    occ = base.select("_id", "is_target", F.explode_outer("_grams").alias("_g"))
    exb = (
        occ.withColumn(
            "bucket",
            F.when(
                F.col("_g").isNotNull(), hash60(F.col("_g"), "dsir") % n_buckets
            ).otherwise(F.lit(-1)),
        )
        .groupBy("_id", "is_target", "bucket")
        .agg(
            F.sum(F.when(F.col("_g").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("_c")
        )
        # materialized once: the bucket-weight fit and the per-doc
        # reduce both read this counted stream; without the checkpoint
        # the weight aggregate's lineage would re-run the gram hash
        # (round-14 measured the fit/apply recompute at ~2x)
        .localCheckpoint(eager=True)
    )
    # broadcast-weights formulation (round-15; the round-14 window
    # form pushed the FULL counted stream through a bucket-keyed
    # exchange just to state #buckets totals): the fit is a
    # #buckets-sized aggregate over the checkpoint — its exchange
    # carries <= n_buckets rows per map partition — broadcast-joined
    # back, so the counted stream crosses exactly ONE full exchange
    # (the groupBy above) instead of two.
    weights = exb.groupBy("bucket").agg(
        F.sum("_c").alias("_r"),
        F.sum(F.when(F.col("is_target"), F.col("_c")).otherwise(F.lit(0))).alias(
            "_t"
        ),
    )
    return (
        exb.join(F.broadcast(weights), "bucket")
        .select(
            "_id",
            "is_target",
            "_c",
            F.expr(f"({scale} * (_t + 1)) div (_r + 1)").alias("_w"),
        )
        .groupBy("_id", "is_target")
        .agg(
            F.sum("_c").alias("n_grams"),
            F.sum(F.col("_c") * F.col("_w")).alias("score"),
        )
        .select(
            F.col("_id").alias(id_col),
            "is_target",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("score").cast("long").alias("score"),
        )
    )
