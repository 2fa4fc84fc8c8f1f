"""Streaming incremental dedup: screen a continuous document stream
against an append-only fingerprint store — the streaming twin of the
batch snapshot screen (operators/dedup.incremental_dedup /
q_dedup_incremental), and the shape a continuously-crawled corpus
actually runs: every arriving micro-batch classifies against
EVERYTHING kept so far, and only fresh fingerprints extend the store.

Per micro-batch (foreachBatch):

  1. fingerprint the batch (map-only);
  2. classify each row against the store: dup_of_corpus (fp already
     stored), dup_in_batch (first sighting is an earlier row of THIS
     batch — keep-min-id within the batch), fresh;
  3. append the decisions to the decision log;
  4. append the batch's NEW fingerprints (one row per fresh fp) to
     the store.

Replay safety follows the merge-law analysis the sketch streams
document (streaming/sketch_stream.py): the STORE is replay-safe by
algebra — fingerprint-set union is idempotent, a re-appended fp
changes no future classification — but the DECISION LOG is not (a
replayed batch would re-classify its fresh rows as dup_of_corpus,
because its own fps now sit in the store). So the loop pairs with the
batch-id commit log, the standard recipe for order-dependent state
(same as streaming CMS / the rollup alert).

Equality contract (pinned by tests/test_dedup_stream.py): streamed
over any doc_id-ordered micro-batch split,

  {rows classified fresh}  ==  deduplicate_exact keepers (batch),

because "fresh" fires exactly when the row is the first sighting of
its fingerprint anywhere — which with ordered arrival is the global
min id per fp, the batch keep-min-id rule.

100 TB shape: the store is |distinct fps| rows of one hash column —
metadata relative to the corpus — and each batch pays one fp-keyed
groupBy plus one co-partitioned join against the store scan; corpus
text never re-shuffles. At deployment scale the store scan is
replaced (or fronted) by the broadcast Bloom pre-filter
(operators/bloom.py) exactly as q_dedup_bloom_screen documents: the
Bloom's false-positive slice is the only part that touches the exact
store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.operators.dedup import fingerprint
from corrie_spark.sinks.base import BatchCommitLog


def screen_batch(
    docs: DataFrame,
    store_dir: str,
    decisions_dir: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the screening loop: fingerprint, classify
    against the store (dup_of_corpus / dup_in_batch / fresh), append
    decisions, extend the store with the fresh fps. Factored out of
    start_dedup_stream so other foreachBatch compositions (the polite
    crawl stream in sources/warc.py) reuse the EXACT classification
    rules — the stream==batch equality contract holds for every
    caller by construction. Caller owns commit-log discipline."""
    import os

    spark = docs.sparkSession
    nf = docs.select(
        F.col(id_col), fingerprint(text_col).alias("fp")
    ).persist()
    try:
        if os.path.isdir(store_dir) and any(
            f.endswith(".parquet") for f in os.listdir(store_dir)
        ):
            seen = spark.read.parquet(store_dir).select("fp").distinct()
        else:
            seen = spark.createDataFrame([], "fp string")
        seen = seen.withColumn("_seen", F.lit(1))
        firsts = nf.groupBy("fp").agg(F.min(id_col).alias("_first"))
        decided = (
            nf.join(firsts, "fp")
            .join(seen, "fp", "left")
            .select(
                F.col(id_col),
                "fp",
                F.when(F.col("_seen").isNotNull(), F.lit("dup_of_corpus"))
                .when(F.col(id_col) > F.col("_first"), F.lit("dup_in_batch"))
                .otherwise(F.lit("fresh"))
                .alias("status"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .persist()
        )
        decided.write.mode("append").parquet(decisions_dir)
        # extend the store with this batch's fresh fps only: one
        # row per NEW fingerprint, so the store stays |distinct
        # fps|-sized however big the stream gets. coalesce(1): the
        # per-batch fresh set is metadata-sized, and writing one
        # part file per shuffle partition (up to 32) per micro-batch
        # IS the small-files growth term at its source
        decided.filter(F.col("status") == "fresh").select("fp").coalesce(
            1
        ).write.mode("append").parquet(store_dir)
        decided.unpersist()
    finally:
        nf.unpersist()


def start_dedup_stream(
    docs: DataFrame,
    store_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    commit_log_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    compact_every: int | None = None,
):
    """Start the screening stream over a (id, text) document stream.
    Returns the StreamingQuery (availableNow by default).
    `compact_every=N` folds the fingerprint store back to one part
    file every N batches (streaming/store.py — publish-then-retire
    swap, safe by the store's value-idempotent union contract), so a
    long-lived stream never accumulates the 10^4-file listing cost
    SCALE.md §22A names; decisions are unaffected (the compaction is
    value-identity)."""
    commit_log = BatchCommitLog(commit_log_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if commit_log.committed(batch_id):
            return
        screen_batch(
            batch_df, store_dir, decisions_dir, batch_id, id_col, text_col
        )
        commit_log.commit(batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            from corrie_spark.streaming.store import compact_store

            compact_store(batch_df.sparkSession, store_dir)

    writer = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_decisions(spark: SparkSession, decisions_dir: str) -> DataFrame:
    """The decision log: (doc_id, fp, status, batch_id) per screened
    row."""
    return spark.read.parquet(decisions_dir)


# --- streaming MEDIA dedup (perceptual-hash screen) ------------------------

def _dhash_bands(df: DataFrame, n_bands: int, bits: int = 62):
    """Explode a (id, dhash) frame to (band, band value) rows with the
    even band split dhash_near_pairs uses (SCALE.md §10: no degenerate
    narrow band)."""
    cols = []
    for b in range(n_bands):
        lo = b * bits // n_bands
        hi = (b + 1) * bits // n_bands
        width = hi - lo
        cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("dhash", lo).bitwiseAND(F.lit((1 << width) - 1)).alias("bv"),
            )
        )
    return df.select("*", F.explode(F.array(*cols)).alias("_b")).select(
        df.columns + [F.col("_b.band").alias("band"), F.col("_b.bv").alias("bv")]
    )


def start_media_dedup_stream(
    media: DataFrame,
    store_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    commit_log_dir: str,
    max_dist: int = 2,
    available_now: bool = True,
    compact_every: int | None = None,
):
    """Streaming IMAGE dedup: the multimodal twin of the fingerprint
    screen, composing the real codecs (BMP/PNG/GIF/JPEG/... behind
    decode_payload), the production resampled dHash, and the
    append-only store pattern. Per micro-batch of (media_id,
    media_type, payload):

      1. decode + 9x8-resample + bit-pack in the Arrow stage
         (image_dhash_resampled); undecodable rows -> status
         'undecodable' (K7-style isolation, logged not dropped);
      2. screen against the store by hamming band join (same even
         band split as dhash_near_pairs, pigeonhole-complete for
         max_dist) + XOR-popcount verify: within max_dist of any
         stored hash -> 'near_dup_of_corpus';
      3. within the batch, exact-hash collapse keep-min-id ->
         'dup_in_batch';
      4. survivors -> 'fresh'; their DISTINCT hashes append to the
         store.

    Near-pairs WITHIN one batch both classify fresh by design (the
    store screen only sees prior batches): the within-batch rule is
    the exact-collapse the batch pipeline applies before banding, and
    near-dup chains across survivors are the batch CC compaction's
    job (q_multimodal_dhash_clusters over the store), exactly like
    the rollup store's periodic merge. With 1-row batches the stream
    IS the greedy keep-first screen — pinned by test.

    Replay safety: store append is idempotent-by-value but the
    decision log is order-dependent, so the loop pairs with the
    batch-id commit log like the text screen above.

    100 TB shape: the store is |distinct hashes| x 8 bytes; each batch
    pays one Arrow decode (no shuffle), one band equi-join against the
    store scan and one exact-hash groupBy. Pixels never leave the
    decode stage; at deployment scale the batch side's bands broadcast
    against the big store scan.

    Hot-band note (SCALE.md §17): unlike the batch pair generators,
    this screen needs no bucket cap — the store is SELF-THINNING. A
    hash within max_dist of any stored hash classifies near_dup and
    never enters the store, so stored hashes are (approximately, up
    to same-batch survivors) pairwise farther than max_dist apart: a
    near-identical content flood contributes ONE stored hash however
    long it runs, and store band buckets stay at the random-hash
    density the ≥12-bit band widths already size for. The join's
    per-batch cost is |batch bucket| x |store bucket|, linear in the
    batch when store buckets are thin — which the screen itself
    maintains."""
    import os

    from pyspark.sql import Column

    from corrie_spark.operators.multimodal import image_dhash_resampled

    commit_log = BatchCommitLog(commit_log_dir)
    n_bands = max_dist + 1

    def popcount(c: Column) -> Column:
        return F.bit_count(c)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if commit_log.committed(batch_id):
            return
        spark = batch_df.sparkSession
        hashes = image_dhash_resampled(batch_df).select(
            "media_id", "dhash", "ok"
        ).persist()
        try:
            if os.path.isdir(store_dir) and any(
                f.endswith(".parquet") for f in os.listdir(store_dir)
            ):
                store = spark.read.parquet(store_dir).select("dhash").distinct()
            else:
                store = spark.createDataFrame([], "dhash bigint")
            good = hashes.filter(F.col("ok") & F.col("dhash").isNotNull())
            bb = _dhash_bands(good.select("media_id", "dhash"), n_bands)
            sb = _dhash_bands(store, n_bands).select(
                "band", "bv", F.col("dhash").alias("_sh")
            )
            near = (
                bb.join(sb, ["band", "bv"])
                .filter(popcount(F.col("dhash").bitwiseXOR(F.col("_sh"))) <= max_dist)
                .select("media_id")
                .distinct()
                .withColumn("_near", F.lit(1))
            )
            firsts = good.groupBy("dhash").agg(F.min("media_id").alias("_first"))
            decided = (
                hashes.join(near, "media_id", "left")
                .join(firsts, "dhash", "left")
                .select(
                    "media_id",
                    "dhash",
                    F.when(~F.col("ok") | F.col("dhash").isNull(), F.lit("undecodable"))
                    .when(F.col("_near").isNotNull(), F.lit("near_dup_of_corpus"))
                    .when(F.col("media_id") > F.col("_first"), F.lit("dup_in_batch"))
                    .otherwise(F.lit("fresh"))
                    .alias("status"),
                )
                .withColumn("batch_id", F.lit(batch_id))
                .persist()
            )
            decided.write.mode("append").parquet(decisions_dir)
            decided.filter(F.col("status") == "fresh").select(
                "dhash"
            ).distinct().coalesce(1).write.mode("append").parquet(store_dir)
            decided.unpersist()
        finally:
            hashes.unpersist()
        commit_log.commit(batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            from corrie_spark.streaming.store import compact_store

            compact_store(batch_df.sparkSession, store_dir)

    writer = (
        media.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
