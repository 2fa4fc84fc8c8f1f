"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. Designed for 100 TB corpora:

  - signatures are computed per-row inside one projection (no shuffle,
    no Python; md5-family hashing is a JVM intrinsic);
  - candidate generation is a band-bucket equi-join (shuffle keyed on
    (band_idx, band_hash) — the classic MinHash-LSH join), never an
    all-pairs cross join;
  - exact dedup is groupBy(fingerprint) + co-partitioned semi-join,
    deterministic keep-min-id policy (dropDuplicates keeps an
    arbitrary row — unacceptable for reproducible corpus builds).

Hashes use md5 (stable across engines/versions) truncated to 60 bits
so the DuckDB oracle can reproduce signatures bit-for-bit. xxhash64
would be ~2x faster but is Spark-only; swap via HASH_FN for pure-Spark
deployments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from corrie_spark.functions import bind
from corrie_spark.operators.text import fingerprint, normalize_text, tokens

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 8
DEFAULT_SHINGLE_K = 3
# Hot-band guard: a (band_idx, band_hash) bucket may hold at most this
# many DISTINCT-TEXT members before candidate_pairs refuses to emit
# its quadratic pair set (members still pair via their other bands).
# 256 distinct texts per 2-slot band hash is ~2^16 pairs per bucket —
# bounded work per reducer regardless of corpus skew.
DEFAULT_BAND_CAP = 256


def hash60(c: Column, salt: int | str = "") -> Column:
    """Deterministic 60-bit positive int hash of a string column:
    first 15 hex digits of md5('<salt>:<value>'). Reproducible in
    DuckDB as ('0x' || substr(md5(...), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c)), 1, 15), 16, 10).cast(
        "bigint"
    )


# MinHash universal-hash family: h_i(x) = (a_i * h32(x) + b_i) mod P.
# One md5 per shingle (h32 = first 8 hex digits) instead of one md5
# per shingle per hash function — 16x fewer md5 calls; the affine
# family over a Mersenne prime scrambles order so slots stay
# (approximately) min-wise independent. Constants are md5-derived so
# the DuckDB oracle can reproduce them.
MINHASH_PRIME = 2147483647  # 2^31 - 1


def affine_constants(num_hashes: int = DEFAULT_NUM_HASHES) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"minhash-a:{i}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"minhash-b:{i}".encode()).hexdigest()[:7], 16)
        out.append((a, b))
    return out


def hash32(c: Column) -> Column:
    """32-bit md5 prefix hash: ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def shingles(text: Column | str, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Word k-gram shingles as an array column; rows with < k tokens get
    a single shingle of all tokens (so short docs still have a
    signature)."""
    def build(toks: Column) -> Column:
        # toks is a bound lambda variable: the tokenizer runs ONCE per
        # row, not once per gram element (see functions.bind)
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
            ),
        )
        # n < k (incl. empty text) -> single shingle of the whole token
        # list; also keeps element_at in-bounds under ANSI mode
        return F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))

    return bind(tokens(text), build)


def minhash_signature(
    grams: Column, num_hashes: int = DEFAULT_NUM_HASHES
) -> Column:
    """MinHash signature: array of per-hash-function minima over the
    shingle set. Single fold over the row-local shingle array — no
    shuffle, one md5 per shingle.

    Implementation notes: the md5 value is bound once per shingle by
    transforming a single-element array (a lambda variable is the only
    way to force single evaluation inside one expression tree); the
    accumulator is the running 16-slot minimum."""
    consts = affine_constants(num_hashes)
    init = F.array(*[F.lit(MINHASH_PRIME).cast("bigint")] * num_hashes)

    def step(acc: Column, g: Column) -> Column:
        vals = F.element_at(
            F.transform(
                F.array(hash32(g)),
                lambda h: F.array(
                    *[(h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME) for a, b in consts]
                ),
            ),
            1,
        )
        return F.zip_with(acc, vals, lambda x, y: F.least(x, y))

    return F.aggregate(grams, init, step)


def lsh_bands(
    sig: Column, num_hashes: int = DEFAULT_NUM_HASHES, bands: int = DEFAULT_BANDS
) -> Column:
    """Split a signature into `bands` buckets; band hash = md5 of
    ':'-joined slot values (a format trivially reproducible in SQL).
    Docs sharing ANY band hash become candidate pairs."""
    rows = num_hashes // bands
    out = []
    for b in range(bands):
        parts = [F.lit(str(b))] + [
            F.element_at(sig, b * rows + 1 + j).cast("string") for j in range(rows)
        ]
        out.append(F.md5(F.concat_ws(":", *parts)))
    return F.array(*out)


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """Append `grams`, `sig` columns (no shuffle).

    The struct is routed through explode(array(...)) — a Generate
    node — as an optimizer barrier: CollapseProject would otherwise
    inline the whole signature fold into EVERY downstream reference
    (e.g. 16 element_at(sig, i) projections -> 16 re-evaluations of
    the MinHash aggregate). After the barrier, downstream references
    are plain attribute reads."""
    grams = shingles(F.col(text_col), k)
    packed = F.explode(
        F.array(
            F.struct(
                grams.alias("grams"),
                minhash_signature(grams, num_hashes).alias("sig"),
            )
        )
    )
    cols = [F.col(c) for c in df.columns]
    return df.select(*cols, packed.alias("_mh")).select(
        *cols, F.col("_mh.grams").alias("grams"), F.col("_mh.sig").alias("sig")
    )


def candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    sigs: DataFrame | None = None,
    collapse_exact: bool = True,
    band_cap: int | None = DEFAULT_BAND_CAP,
    expand_members: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id_a < id_b) with estimated
    Jaccard = fraction of matching signature slots.

    `expand_members=False` (cluster consumers only; requires
    collapse_exact): skip the member fan-out — return rep-level
    candidate pairs plus ONE (rep, member) star edge per collapsed
    duplicate (jaccard_est 1.0: identical text = identical signature).
    Connected components over this edge set equal CC over the full
    pair list (members share their rep's bands, so every member-level
    candidate is a rep-level candidate expanded; the star keeps each
    exact-dup group connected through its min-id rep) at
    O(rep-pairs + n) rows instead of O(sum group^2) — the text twin of
    operators/similarity.embedding_near_dups' cluster mode.

    Scale shape — two guards keep a hot band bucket from going
    quadratic (at crawl scale templated/boilerplate pages make hot
    bands the NORM, not the exception):

    1. exact-collapse-first (`collapse_exact`): group by the raw
       md5(text) content fingerprint and run the band self-join over
       ONE representative per distinct text; member pairs are fanned
       back out afterwards through two id-keyed fingerprint joins.
       N byte-identical copies cost the band join 1 row instead of N
       (the pair LIST is still N-choose-2 — that is the operator's
       contract — but it is produced by cheap long-only joins, never
       by a sig-carrying band bucket of size N). Identical text =>
       identical signature, so fanned-out pairs carry exactly the
       jaccard_est the un-collapsed join would have computed.
    2. band-frequency cap (`band_cap`) with star overflow: a
       (band_idx, band_hash) bucket with B distinct-text members
       emits B^2/2 candidates from the self-join; a window count
       routes buckets over the cap OUT of the self-join BEFORE it
       runs, bounding per-bucket join work at cap^2 regardless of
       skew. Over-cap buckets are not dropped: each member pairs
       with the bucket's min-id hub instead (B-1 star edges), so a
       templated near-duplicate clique of ANY size still reaches the
       verify stage and collapses to one connected component — at
       O(B) candidates per bucket, never O(B^2). (Measured on a
       1000-doc templated fixture: 499,179 unguarded pairs vs 1,924
       star pairs.) AQE skew splitting CANNOT do this: it splits a
       skewed partition across tasks but leaves the quadratic pair
       cardinality intact.

    The band join key (band_idx, band_hash) shuffles both sides
    identically (co-partitioned); the cap's window count shuffles on
    the same key, so it rides the exchange the join needs anyway.

    `sigs` optionally injects a pre-built (id_col, sig) frame — pass a
    PERSISTED one (e.g. a session memo) so the md5-heavy signature
    scan runs once, not once per self-join side: Catalyst does not
    reuse the exchange across the two sides of this join, so without
    materialization the corpus is re-hashed twice. At scale the
    signature frame is #docs x (16 longs) — far smaller than the
    corpus text it replaces in memory. With `collapse_exact` the
    frame is semi-joined down to one row per distinct text before
    banding (when `sigs` is None, signatures are only ever COMPUTED
    for representatives)."""
    if collapse_exact:
        fps = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_fp"))
        reps = fps.groupBy("_fp").agg(F.min(id_col).alias(id_col))
        if sigs is None:
            rep_sigs = with_minhash(
                df.join(reps.select(id_col), id_col), text_col, num_hashes
            ).select(id_col, "sig")
        else:
            rep_sigs = sigs.select(id_col, "sig").join(reps.select(id_col), id_col)
        rep_sigs = rep_sigs.join(reps, id_col)  # + _fp
    else:
        if sigs is None:
            rep_sigs = with_minhash(df, text_col, num_hashes).select(id_col, "sig")
        else:
            rep_sigs = sigs.select(id_col, "sig")
    carry = [F.col(id_col), F.col("sig")] + (
        [F.col("_fp")] if collapse_exact else []
    )
    exploded = rep_sigs.select(
        *carry,
        F.posexplode(lsh_bands(F.col("sig"), num_hashes, bands)).alias(
            "band_idx", "band_hash"
        ),
    )
    star = None
    if band_cap is not None:
        bucket = Window.partitionBy("band_idx", "band_hash")
        ordered = bucket.orderBy(F.col(id_col))
        counted = exploded.withColumn("_bn", F.count(F.lit(1)).over(bucket))
        hot = counted.where(F.col("_bn") > band_cap)
        exploded = counted.where(F.col("_bn") <= band_cap).drop("_bn")
        # star overflow: hub = min id of the bucket; the ordered
        # window's first() rides the SAME (band_idx, band_hash)
        # exchange as the count, so the overflow costs no extra
        # shuffle — and emits B-1 edges per hot bucket, not B^2/2.
        hub_cols = [
            F.min(F.col(id_col)).over(bucket).alias("_hub"),
            F.first("sig").over(ordered).alias("_hub_sig"),
        ] + ([F.first("_fp").over(ordered).alias("_hub_fp")] if collapse_exact else [])
        star = (
            hot.select(F.col(id_col), F.col("sig"), *carry[2:], *hub_cols)
            .where(F.col(id_col) != F.col("_hub"))
            .select(
                F.col("_hub").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.col("_hub_sig").alias("sig_a"),
                F.col("sig").alias("sig_b"),
                *(
                    [F.col("_hub_fp").alias("fp_a"), F.col("_fp").alias("fp_b")]
                    if collapse_exact
                    else []
                ),
            )
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    fp_carry = (
        [F.col("a._fp").alias("fp_a"), F.col("b._fp").alias("fp_b")]
        if collapse_exact
        else []
    )
    joined = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.sig").alias("sig_a"),
        F.col("b.sig").alias("sig_b"),
        *fp_carry,
    )
    if star is not None:
        joined = joined.unionByName(star)
    pairs = joined.dropDuplicates(["id_a", "id_b"])
    if collapse_exact and not expand_members:
        # CC-sufficient edge set: rep pairs as-is + one star edge per
        # collapsed member (rep = group min id, so id_a < id_b holds);
        # both sides of a star edge carry the rep's signature, so the
        # jaccard_est projection below scores them 1.0 exactly.
        stars = (
            fps.join(reps.select(F.col(id_col).alias("_rid"), "_fp"), "_fp")
            .where(F.col(id_col) != F.col("_rid"))
            .join(rep_sigs.select("_fp", F.col("sig").alias("sig_a")), "_fp")
            .select(
                F.col("_rid").alias("id_a"),
                F.col(id_col).alias("id_b"),
                "sig_a",
                F.col("sig_a").alias("sig_b"),
            )
        )
        pairs = pairs.select("id_a", "id_b", "sig_a", "sig_b").unionByName(stars)
    elif collapse_exact:
        # fan representative pairs back out to members: two id-keyed
        # joins on the (id, fingerprint) frame — no signature payload
        # crosses these shuffles beyond the one rep sig per pair.
        ma = fps.select(F.col("_fp").alias("fp_a"), F.col(id_col).alias("_ma"))
        mb = fps.select(F.col("_fp").alias("fp_b"), F.col(id_col).alias("_mb"))
        fanned = (
            pairs.join(ma, "fp_a")
            .join(mb, "fp_b")
            .select(
                F.least("_ma", "_mb").alias("id_a"),
                F.greatest("_ma", "_mb").alias("id_b"),
                "sig_a",
                "sig_b",
            )
        )
        # within-fingerprint pairs (byte-identical texts): all bands
        # match by construction, so every such pair is a candidate;
        # both sides share the representative's signature.
        m1 = fps.select("_fp", F.col(id_col).alias("id_a"))
        m2 = fps.select("_fp", F.col(id_col).alias("id_b"))
        within = (
            m1.join(m2, "_fp")
            .where(F.col("id_a") < F.col("id_b"))
            .join(rep_sigs.select("_fp", F.col("sig").alias("sig_a")), "_fp")
            .select("id_a", "id_b", "sig_a", F.col("sig_a").alias("sig_b"))
        )
        pairs = fanned.unionByName(within)
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        (matches.cast("double") / F.lit(num_hashes)).alias("jaccard_est"),
    )


def deduplicate_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint, keep-min-id.

    Two-shuffle plan: groupBy(fp) computes keeper ids (partial agg
    map-side), then an inner join on (fp, id) keeps exactly those
    rows. Both shuffles key on fp -> co-partitioned, no broadcast of
    the big side."""
    with_fp = df.withColumn("_fp", fingerprint(text_col))
    keepers = with_fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return with_fp.join(keepers, ["_fp", id_col], "inner").drop("_fp")


def duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-fingerprint group stats: (fingerprint, keep_id, n_copies)."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_fn=None,
) -> DataFrame:
    """Classify an INCOMING batch against an existing corpus — the
    snapshot-over-snapshot dedup step of a continuously-crawled
    training corpus (every new crawl screens against everything
    already kept, never corpus x corpus again):

      dup_of_corpus  the fingerprint already exists in the corpus
                     (takes precedence: every batch copy is dropped)
      dup_in_batch   new fingerprint, but an earlier (lower-id) batch
                     row claims it — keep-min-id within the batch
      fresh          first sighting anywhere

    Scale shape: the corpus contributes ONLY its fingerprint column
    (a single-column scan — or, in a real deployment, the stored fp
    index of prior snapshots), distinct-ed into |unique fps| rows.
    Every stage is keyed on fp: one groupBy for the batch keep-min,
    then two co-partitioned joins reusing that partitioning; the
    batch never joins the corpus' text. `fp_fn` picks the key
    (default exact `fingerprint`; `prefix_fingerprint` for
    template/boilerplate screening)."""
    fp_fn = fp_fn or fingerprint
    nf = batch.select(F.col(id_col), fp_fn(text_col).alias("fp"))
    seen = (
        corpus.select(fp_fn(text_col).alias("fp"))
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    firsts = nf.groupBy("fp").agg(F.min(id_col).alias("_first"))
    return (
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
    )


def simhash(text: Column | str, bits: int = 48) -> Column:
    """SimHash over word tokens: per-bit vote of token hashes, packed
    into a BIGINT (<= 62 bits). Row-local, no shuffle; one md5 per
    token (bind, or the 48 bit-tests would each re-hash)."""

    def step(acc: Column, t: Column) -> Column:
        # bit positions are python ints (shiftright requires literal
        # shift amounts); h is bound once per token
        return bind(
            hash60(t),
            lambda h: F.zip_with(
                acc,
                F.array(
                    *[
                        F.when(
                            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                        ).otherwise(F.lit(-1))
                        for b in range(bits)
                    ]
                ),
                lambda a_, v: a_ + v,
            ),
        )

    votes = F.aggregate(tokens(text), F.array_repeat(F.lit(0), bits), step)
    return bind(
        votes,
        lambda v: sum(
            (
                F.when(F.element_at(v, b + 1) > 0, F.lit(1 << b).cast("bigint")).otherwise(
                    F.lit(0).cast("bigint")
                )
                for b in range(bits)
            ),
            F.lit(0).cast("bigint"),
        ),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 48,
    bands: int = 4,
    max_hamming: int = 6,
    signatures: DataFrame | None = None,
    band_cap: int | None = DEFAULT_BAND_CAP,
) -> DataFrame:
    """SimHash near-dup candidate pairs via hamming-band blocking:
    split the signature into `bands` equal bit-bands; a pair is a
    candidate iff ANY band matches exactly (pigeonhole: every pair
    within hamming distance < `bands` is guaranteed caught), then the
    exact hamming distance filters candidates to <= max_hamming.

    Scale shape — same as the MinHash-LSH path (and carrying the same
    two §14 hot-band guards): signature is a row-local map stage;
    exact-collapse-first bands ONE representative per distinct
    simhash value (near-identical boilerplate pages often land on the
    IDENTICAL simhash, so N copies cost the band join 1 row and their
    hamming-0 pairs — the contract — fan out through value-keyed
    long-only joins); band buckets over `band_cap` distinct values
    route to a min-id-hub star (B-1 candidates, popcount-verified)
    instead of the B^2/2 self-join; the XOR popcount verify runs on
    candidates only. Output-identity below the cap (pinned by the
    unchanged oracles)."""
    band_width = bits // bands
    mask = (1 << band_width) - 1
    # signatures may be precomputed/persisted by the caller (queries
    # sharing one signature pass); expected columns (id_col, simhash)
    sh = (
        signatures
        if signatures is not None
        else df.select(F.col(id_col), simhash(F.col(text_col), bits).alias("simhash"))
    )
    # ONE simhash-keyed aggregation yields the representative table
    # AND the identical-hash member lists (round-15, guide §2.3/§2.4:
    # the reps groupBy, the member fan-out joins and the within-value
    # self-join previously each re-shuffled the signature frame on
    # the same key — 5 signature-frame exchanges collapse to 1).
    # materialized once: four consumers (band explode, both fan-out
    # sides, within-value pairs) would otherwise each re-run the agg —
    # exchange reuse does not fire across differently-pruned subplans
    groups = (
        sh.groupBy("simhash")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .localCheckpoint(eager=True)
    )
    # packed band key: (band index << band_width) | band value — one
    # long join/grouping key instead of (int, long) (guide §2.3
    # narrower types)
    exploded = groups.select(
        F.element_at("_ids", 1).alias("_rep"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * band_width)
                    .bitwiseAND(F.lit(mask))
                    .bitwiseOR(F.lit(b << band_width))
                    for b in range(bands)
                ]
            )
        ).alias("_bkey"),
    )
    # bucket members aggregate on the packed key (ONE exchange —
    # was: a window count + a self-join, i.e. the exploded frame
    # crossing band-keyed exchanges twice); pair generation, the
    # band-cap clique/star routing AND the exact hamming verify all
    # run INSIDE the bucket row, so only verified candidate pairs
    # ever shuffle again (the previous shape dragged unverified
    # candidates through dropDuplicates + three fan-out joins and
    # verified last).
    buckets = exploded.groupBy("_bkey").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_rep").alias("i"), F.col("simhash").alias("s")))
        ).alias("_ms")
    )
    ms = F.col("_ms")

    def pair_of(x, y):
        return F.struct(
            x["i"].alias("ia"),
            y["i"].alias("ib"),
            x["s"].alias("sa"),
            y["s"].alias("sb"),
        )

    clique = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms)), lambda y: pair_of(x, y)
            ),
        )
    )
    if band_cap is not None:
        # min-id-hub star above the cap: B-1 edges, never B^2/2 —
        # same overflow contract as before, now chosen per bucket row
        star = F.transform(
            F.slice(ms, 2, F.size(ms)), lambda y: pair_of(F.element_at(ms, 1), y)
        )
        pairs_arr = F.when(F.size(ms) <= band_cap, clique).otherwise(star)
    else:
        pairs_arr = clique
    verified = F.filter(
        pairs_arr,
        lambda p: F.bit_count(p["sa"].bitwiseXOR(p["sb"])) <= max_hamming,
    )
    cand = (
        buckets.select(F.explode(verified).alias("p"))
        .select("p.ia", "p.ib", "p.sa", "p.sb")
        .dropDuplicates(["ia", "ib"])  # multi-band collisions once
    )
    # fan representative pairs back out to identical-simhash members
    # via the member LISTS (the pair cross-product is a row-local
    # transform; the joins carry one array row per distinct hash)
    ga = groups.select(F.col("simhash").alias("sa"), F.col("_ids").alias("_as"))
    gb = groups.select(F.col("simhash").alias("sb"), F.col("_ids").alias("_bs"))
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("bigint")
    fanned = (
        cand.join(ga, "sa")
        .join(gb, "sb")
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "_as",
                        lambda a: F.transform(
                            "_bs",
                            lambda b: F.struct(
                                F.least(a, b).alias("id_a"),
                                F.greatest(a, b).alias("id_b"),
                            ),
                        ),
                    )
                )
            ).alias("p"),
            hamming.alias("hamming"),
        )
        .select("p.id_a", "p.id_b", "hamming")
    )
    # within-value pairs are hamming 0 by construction (identical
    # text ⇒ identical signature) — generated row-locally from the
    # member lists the groups aggregation already holds
    ids = F.col("_ids")
    within = (
        groups.where(F.size("_ids") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        ids,
                        lambda x, i: F.transform(
                            F.slice(ids, i + F.lit(2), F.size(ids)),
                            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", F.lit(0).cast("bigint").alias("hamming"))
    )
    return fanned.unionByName(within)


def ngram_jaccard(text_a: Column, text_b: Column, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Exact n-gram Jaccard between two text columns (pair-level
    verifier applied AFTER LSH candidate generation, never all-pairs)."""
    ga = F.array_distinct(shingles(text_a, k))
    gb = F.array_distinct(shingles(text_b, k))
    inter = F.size(F.array_intersect(ga, gb))
    union = F.size(F.array_union(ga, gb))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union)


def ngram_containment(
    text_a: Column, text_b: Column, k: int = DEFAULT_SHINGLE_K
) -> Column:
    """Directional n-gram containment struct (cont_a, cont_b) where
    cont_a = |grams(A) ∩ grams(B)| / |grams(A)|. The asymmetric
    near-dup measure Jaccard misses: a short document wholly embedded
    in a long one has high containment but low Jaccard (|∩|/|∪| is
    diluted by the long side's extra grams) — exactly the
    quote/boilerplate/sub-document duplication case a training-data
    pipeline must catch. Pair-level verifier applied AFTER LSH
    candidate generation, never all-pairs."""
    def with_b(ga: Column) -> Column:
        def build(gb: Column) -> Column:
            inter = F.size(F.array_intersect(ga, gb)).cast("double")
            na, nb = F.size(ga), F.size(gb)
            cont_a = F.when(na == 0, F.lit(0.0)).otherwise(inter / na)
            cont_b = F.when(nb == 0, F.lit(0.0)).otherwise(inter / nb)
            return F.struct(cont_a.alias("cont_a"), cont_b.alias("cont_b"))

        return bind(F.array_distinct(shingles(text_b, k)), build)

    return bind(F.array_distinct(shingles(text_a, k)), with_b)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
    return_rounds: bool = False,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every
    node gets cluster_id = the minimum node id reachable from it (the
    canonical representative). The dedup KEEP policy is then "keep the
    representative, drop the rest".

    Algorithm: min-label propagation with POINTER JUMPING. Each round:
      1. neighbor-min:  label(v) <- min(label(v), min_{u~v} label(u))
      2. shortcut:      label(v) <- min(label(v), label(label(v)))
    Step 2 (path halving) turns worst-case O(component diameter)
    rounds into O(log diameter) — a 10^6-node chain converges in ~20
    rounds instead of 10^6. The invariant both steps preserve is
    "label(v) is the id of some node in v's component and never
    increases", so the fixpoint is exactly the component minimum —
    same output as plain propagation, proven by the recursive-closure
    DuckDB oracle on q_dedup_clusters.

    Each round is two shuffles keyed on node id (neighbor join +
    shortcut self-join); the driver loop carries only a changed-row
    COUNT, never data; per-round localCheckpoint keeps the plan O(1).
    Raises if max_iters is hit without convergence (silent truncation
    would return WRONG labels).

    edges: (id_a, id_b) undirected pairs. nodes: one row per id_col —
    nodes without edges become singleton clusters of themselves.
    Edge endpoints are expected to be a subset of `nodes`; endpoints
    that are not receive NO label (excluded from the output, exactly
    like the pre-fused formulation) rather than a silently-NULL one.
    """
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        # materialize once: the edge list is re-joined every round and
        # its upstream (LSH pair generation) must not recompute per
        # iteration — this one line is a ~10x win on the whole loop
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # ONE fused round: new_label(v) = min(label(v),
        #                                     min_{u~v} label(u),      [neighbor step]
        #                                     label(label(v)))         [pointer jump]
        # All three candidates are ids inside v's component and labels
        # only shrink, so the invariant and the fixpoint (= component
        # minimum) are those of the sequential two-step round; applying
        # the jump to the round-START labels (Jacobi, not Gauss-Seidel)
        # can cost one extra round on some graphs but halves the
        # per-round materializations: a single eager checkpoint + the
        # changed-count probe instead of two checkpoints + count.
        nbr = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("cand"))
            .select(F.col("src").alias("node"), "cand", F.lit(None).cast("long").alias("old"))
        )
        parent = labels.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        # every label IS some node's id (invariant), so the hop join is
        # inner and total — no left/coalesce needed
        jump = labels.join(parent, labels.label == parent.p_node).select(
            "node", F.col("p_label").alias("cand"), F.lit(None).cast("long").alias("old")
        )
        keep = labels.select("node", F.col("label").alias("cand"), F.col("label").alias("old"))
        updated = (
            keep.unionByName(nbr)
            .unionByName(jump)
            .groupBy("node")
            # old is non-null exactly once per node (the keep branch)
            .agg(F.min("cand").alias("new_label"), F.max("old").alias("label"))
            # contract: every edge endpoint must appear in `nodes`. An
            # endpoint that doesn't reaches this agg only through the
            # nbr branch (old=NULL for every contribution), so the
            # filter excludes it — same behavior as the pre-fused
            # formulation — instead of letting a NULL round-start
            # label corrupt the output silently (round-6 advice)
            .filter(F.col("label").isNotNull())
            # one materialization per round: the changed-count probe and
            # the next round's labels both read this, and the lineage is
            # cut so each round's plan stays O(1)
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_label") < F.col("label")).limit(1).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters; raise max_iters)"
        )
    out = labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
    return (out, rounds) if return_rounds else out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Crawl-over-crawl snapshot diff: classify every document id as
    added / removed / changed / unchanged by comparing content
    fingerprints across two snapshots — the QC report an operator
    reads before promoting a new crawl (did the refresh drop a
    source? rewrite half the corpus?).

    Scale shape: ONE id-keyed full-outer join (both sides hash-
    partition on the id; fingerprints are computed map-side before
    the exchange, so the join carries (id, fp, carry) — never text or
    payloads). `carry` columns ride through new-side-first
    (COALESCE(new, old)) so removed rows keep their old metadata."""
    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(fp_col).alias("_fp_old"),
        *[F.col(c).alias(f"_old_{c}") for c in carry],
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(fp_col).alias("_fp_new"),
        *[F.col(c).alias(f"_new_{c}") for c in carry],
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), "added")
        .when(F.col("_fp_new").isNull(), "removed")
        .when(F.col("_fp_new") != F.col("_fp_old"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        F.col("_id").alias(id_col),
        status.alias("status"),
        *[
            F.coalesce(F.col(f"_new_{c}"), F.col(f"_old_{c}")).alias(c)
            for c in carry
        ],
    )
