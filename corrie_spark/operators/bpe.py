"""In-engine BPE-style vocabulary induction (word-level merge rules).

Byte-pair-encoding training's inner loop — count adjacent symbol
pairs, merge the most frequent, repeat — run as DataFrame rounds over
the corpus, the same iterative-trainer discipline as the Lloyd
k-means in operators/similarity.py:

  - per round, pair counting is ONE map stage (adjacent pairs from
    each doc's token array) + ONE partially-aggregated groupBy — the
    shuffle carries a row per distinct pair per partition;
  - the winning pair (count desc, then lexicographic — fully
    deterministic) is a 1-row driver collect, exactly like the
    #cells x dim centroid collect: metadata, never data;
  - the merge itself is a map-only fold over each token array
    (higher-order `aggregate` with a list accumulator), the winner
    folded in as two string literals — no join, no shuffle;
  - plans stay flat across rounds because each round's tokens column
    is a new expression over the previous (3 rounds deep is fine;
    for deep vocabularies localCheckpoint per round like
    connected_components).

Word-level simplification: real BPE merges characters into subwords;
the adjacent-pair/merge/repeat loop — the part that is interesting to
distribute — is identical, and running it over words keeps the
oracle SQL readable. The DuckDB oracle replays every round exactly
(list_reduce with a list accumulator mirrors the Spark fold), so the
learned merge TABLE, not just counts, is cross-engine checked.

Greedy-merge caveat: like real BPE, round r+1's counts depend on
round r's merge — the rounds are inherently sequential; parallelism
lives inside each round (the corpus scan), which is where the data
is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corrie_spark.operators.text import tokens


def _adjacent_pairs(toks: Column) -> Column:
    """array<struct<a,b>> of adjacent token pairs; < 2 tokens -> []."""
    return F.when(F.size(toks) < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i.cast("int")).alias("a"),
                F.element_at(toks, (i + 1).cast("int")).alias("b"),
            ),
        )
    )


def _merge_fold(toks: Column, a: str, b: str, merged: str | None = None) -> Column:
    """Map-only left-to-right merge of every (a, b) adjacency into
    one 'a b' token — the BPE apply step as a higher-order aggregate
    with a list accumulator. Greedy left-to-right: after emitting a
    merge, the merged token ends the accumulator, so an overlapping
    'b b' (when a == b) correctly does NOT re-merge — matching
    standard BPE apply semantics."""
    merged_lit = F.lit(f"{a} {b}" if merged is None else merged)
    empty = F.array().cast("array<string>")

    def step(acc: Column, x: Column) -> Column:
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b))
        return F.when(
            can,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged_lit)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.when(F.size(toks) == 0, empty).otherwise(F.aggregate(toks, empty, step))


def train_merges(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` word-level merge rules. Returns
    [(rank, token_a, token_b, pair_count)] with rank starting at 1.
    Each round: one corpus aggregation + a 1-row collect. The
    re-tokenized corpus is localCheckpointed per round — round r
    reads round r-1's materialized arrays instead of replaying r-1
    nested folds over the raw scan (the connected_components
    lineage discipline; at cluster scale this is a cached/parquet
    stage table)."""
    toks = tokens(text_col)
    cur = docs.select(toks.alias("t")).localCheckpoint(eager=False)
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            cur.select(F.explode(_adjacent_pairs(F.col("t"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        out.append((rank, a, b, n))
        cur = cur.select(_merge_fold(F.col("t"), a, b).alias("t")).localCheckpoint(
            eager=False
        )
    return out


# --- REAL subword BPE: train over the word-frequency table -----------------


def train_subword_merges(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """TRUE BPE training structure (Sennrich et al. 2016): learn
    merges over the WORD-FREQUENCY table, not the raw corpus. The
    corpus-scale work is exactly one tokenize + word count (a single
    partially-aggregated shuffle); every merge round then runs over
    the vocab frame — |vocab| rows regardless of corpus size, which
    is what makes k=30000 merges tractable at 100 TB (rounds cost
    vocab-sized scans, and the vocab frame is localCheckpointed per
    round like the word-level trainer).

    Pair counts are weighted by word frequency; the winner is
    deterministic (weighted count DESC, then lexicographic). Returns
    [(rank, sym_a, sym_b, weighted_count)].
    """
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # initial symbol sequence = the word's characters (no end-of-word
    # marker: the synthetic corpus is space-tokenized and merges never
    # need to cross words here; append a sentinel element if the
    # downstream tokenizer requires one)
    sym = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    cur = vocab.select(sym.alias("s"), "freq").localCheckpoint(eager=False)
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            cur.select(F.explode(_adjacent_pairs(F.col("s"))).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        out.append((rank, a, b, n))
        cur = cur.select(
            _merge_fold(F.col("s"), a, b, merged=a + b).alias("s"), "freq"
        ).localCheckpoint(eager=False)
    return out


def apply_merges(
    words: DataFrame, merges: list[tuple[int, str, str, int]], word_col: str = "w"
) -> DataFrame:
    """Segment words with a learned merge table: chars -> fold each
    merge IN RANK ORDER (BPE apply is order-sensitive: later merges
    consume earlier merges' outputs). Adds `sym` (array<string>) —
    map-only, vocab-sized input, merge literals folded into the
    projection."""
    sym = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.col(word_col).substr(i, F.lit(1)),
    )
    for _rank, a, b, _n in sorted(merges):
        sym = _merge_fold(sym, a, b, merged=a + b)
    return words.withColumn("sym", sym)
