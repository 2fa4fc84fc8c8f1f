"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force top-k cosine: exact baseline. Quantized-integer dot
    products (scale 2^15) make ranking exactly reproducible across
    engines (float-sum order never matters) and keep the hot loop in
    JVM codegen: zip_with + aggregate over two 64-float arrays.
  - LSH-bucketed ANN (random hyperplanes): the 100 TB path. Each
    vector gets a B-bit signature from fixed md5-derived hyperplanes;
    candidates = bucket equi-join (optionally multi-probe), then exact
    re-rank within buckets. Shuffle is keyed on the signature, so the
    join is co-partitioned and the cross product is per-bucket only.

Scoring stays JVM-side (built-in array expressions, whole-stage
codegen — no row-at-a-time Python anywhere). The ONE deliberate
Python stage is local_topk's Arrow-batched per-partition top-k:
built-in aggregates cannot bound a partial top-k (collect_list's
map-side buffers ship every row), so the scored candidates take one
vectorized pass through pandas to cap the re-rank shuffle at
~#queries x k rows per partition — a linear map-side cost paid to
remove an unbounded exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1 << 15  # float32 * 2^15 -> exact integer (see module doc)


def quantize(vec: Column) -> Column:
    """array<float> -> array<bigint>, v -> floor(v * 2^15). Multiplying
    a float32-exact double by a power of two is exact; floor is exact;
    so every engine computes identical integers."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * F.lit(QUANT_SCALE)).cast("bigint"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def int_norm_sq(a: Column) -> Column:
    return int_dot(a, a)


def cosine_from_int(dot: Column, n1: Column, n2: Column) -> Column:
    """Cosine from exact integer dot/norms; double sqrt+division is
    IEEE-deterministic given identical integer inputs."""
    return dot.cast("double") / (
        F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double"))
    )


def local_topk(
    scored: DataFrame,
    k: int,
    key_col: str = "query_id",
    order_col: str = "dot",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Per-PARTITION per-query top-k — the bounded partial aggregate
    Spark's built-ins cannot express: a row_number window exchanges
    every scored row, and collect_list's map-side partial buffers also
    ship every row (slice() applies only after the final merge). This
    Arrow-batched map stage caps each partition's output at
    #queries x k rows BEFORE any exchange, which is what makes the
    follow-up groupBy shuffle ~Q x k x P instead of |scored|.

    Runs a streaming fold over the partition's record batches: the
    carry is at most #queries x k rows, so memory stays bounded on
    arbitrarily large partitions. Ordering (dot desc, neighbor_id asc)
    matches the global merge exactly; keeping a superset locally can
    never drop a global top-k row (top-k is a semilattice)."""
    import pandas as pd

    def take(batches):
        run: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if run is None else pd.concat([run, pdf], ignore_index=True)
            cur = cur.sort_values(
                [order_col, id_col], ascending=[False, True], kind="mergesort"
            )
            run = cur.groupby(key_col, sort=False).head(k)
        if run is not None and len(run):
            yield run

    return scored.mapInPandas(take, scored.schema)


def grouped_topk(
    scored: DataFrame,
    k: int,
    key_col: str = "query_id",
    order_col: str = "dot",
    id_col: str = "neighbor_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Exact global top-k per key over a scored candidate set — the
    GENERIC partial-top-k operator (similarity re-rank is one caller;
    any "top N per group, N small, groups many" shape fits): local
    (per-partition) top-k, then ONE hash aggregation on `key_col`
    whose input is already bounded — slice(sort_array(
    collect_list(...)), 1, k) + posexplode replaces the full-sort
    row_number window. The sort key struct((-order), id) makes
    sort_array's lexicographic ascending order = order desc with ties
    to the lowest id — bit-identical ranking to the window
    formulation. `order_col` must be numeric and exact (integers
    here; |dot| < 2^45 so negation is safe); `carry` columns ride
    along inside the struct. Output: (key, id, rnk, order, *carry)."""
    entry = F.struct(
        (-F.col(order_col)).alias("negord"),
        F.col(id_col).alias("topk_id"),
        *[F.col(c).alias(c) for c in carry],
    )
    agg = (
        local_topk(scored, k, key_col, order_col, id_col)
        .groupBy(key_col)
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("top"))
    )
    ex = agg.select(key_col, F.posexplode("top").alias("pos", "e"))
    return ex.select(
        key_col,
        F.col("e.topk_id").alias(id_col),
        (F.col("pos") + 1).cast("int").alias("rnk"),
        (-F.col("e.negord")).alias(order_col),
        *[F.col(f"e.{c}").alias(c) for c in carry],
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query set against the corpus scan —
    one pass over the corpus, no corpus shuffle — then PARTIAL top-k:
    a per-partition bounded top-k (map stage) feeds one hash agg on
    query_id, so the only exchange carries ~#queries x k rows per
    partition instead of the full scored set (the old window top-k
    shuffled and sorted every scored row). Rank ties break on
    neighbor id -> fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            int_dot(F.col("q_vec"), F.col("c_vec")).alias("dot"),
            int_norm_sq(F.col("q_vec")).alias("qn"),
            int_norm_sq(F.col("c_vec")).alias("cn"),
        )
    )
    return grouped_topk(scored, k, carry=("qn", "cn")).select(
        "query_id",
        "neighbor_id",
        "rnk",
        "dot",
        cosine_from_int(F.col("dot"), F.col("qn"), F.col("cn")).alias("cosine"),
    )


def planes_for_corpus(
    n_rows: int,
    target_bucket_size: int = 256,
    min_planes: int = 4,
    max_planes: int = 24,
) -> int:
    """Scale-derived hyperplane count: enough planes that the EXPECTED
    bucket size n / 2^planes stays near `target_bucket_size`.

    A fixed plane count is a scale-killer: per-bucket candidate
    generation is quadratic in bucket size, so 8 planes (256 buckets)
    that are fine at 10^5 vectors mean 10^9-row buckets at 100 TB.
    planes = ceil(log2(n / target)) keeps per-bucket cost constant as
    the corpus grows; the cap bounds signature cost (each plane is one
    64-dim integer projection per row).
    """
    import math

    if n_rows <= target_bucket_size:
        return min_planes
    return max(min_planes, min(max_planes, math.ceil(math.log2(n_rows / target_bucket_size))))


def hyperplane_signature(
    qvec: Column | str, n_planes: int = 8, dim: int = 64, table: int = 0
) -> Column:
    """Random-hyperplane LSH signature (SimHash for vectors) over a
    QUANTIZED vector, packed into an int. Plane p's component d is a
    deterministic pseudo-random 32-bit int derived from md5(p:d) —
    reproducible anywhere, no stored plane matrix, broadcast-free.

    The projection is an exact BIGINT sum (|q| <= 2^19, |w| <= 2^31,
    dim <= 64 -> |proj| < 2^57): bucket assignment is bit-identical
    across engines, immune to float summation order.

    `table` selects an independent hash table (OR-amplification, the
    MinHash-band construction applied to hyperplanes): table 0 keeps
    the historical salt `plane{p}:` so existing oracles reproduce;
    table t>0 salts with `plane{t}:{p}:` (the ':' separators make the
    families collision-free across tables).

    The plane matrix is DATA-INDEPENDENT, so the md5 derivations run
    once on the driver (hashlib) and enter the plan as literal arrays
    — the per-row work is n_planes integer dot products, zero hashing.
    (The naive in-plan md5 formulation costs rows x planes x dim md5
    calls: 2.5M for a 2k-corpus multiprobe signature — measured 2x on
    the whole query.) The DuckDB oracle recomputes the same constants
    symbolically; values are identical by construction."""
    ws = _plane_weights(n_planes, dim, table)
    if isinstance(qvec, str):
        # fast path: ONE server-parsed SQL expression. The Column
        # formulation below costs ~10 py4j round trips per plane
        # (lambda construction) — measured ~3.5s of pure driver time
        # for a 2-table 14-plane signature pair; a single expr() is
        # one round trip and parses in milliseconds.
        parts = []
        for p in range(n_planes):
            arr = "array(" + ",".join(f"{x}L" for x in ws[p]) + ")"
            proj = (
                f"aggregate(zip_with({qvec}, {arr}, (x, w) -> x * w), "
                "0L, (acc, x) -> acc + x)"
            )
            parts.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p}L ELSE 0L END)")
        return F.expr("CAST((" + " + ".join(parts) + ") AS LONG)")
    bits = []
    for p in range(n_planes):
        # one foldable array Literal per plane (NOT CreateArray of 64
        # nodes — that unrolls into the generated code and the compile
        # cost eats the md5 savings)
        warr = F.lit(ws[p]).cast("array<bigint>")
        proj = F.aggregate(
            F.zip_with(qvec, warr, lambda x, w: x * w),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _plane_weights(n_planes: int, dim: int, table: int) -> list[list[int]]:
    """w[p][d] = int(md5(salt + str(d))[:8], 16) - 2^31 — the exact
    integers the oracle's symbolic md5 produces."""
    import hashlib

    out = []
    for p in range(n_planes):
        salt = f"plane{p}:" if table == 0 else f"plane{table}:{p}:"
        out.append(
            [
                int(hashlib.md5(f"{salt}{d}".encode()).hexdigest()[:8], 16) - (1 << 31)
                for d in range(dim)
            ]
        )
    return out


def _multi_table_sig(df: DataFrame, vec: str, n_planes: int, dim: int, n_tables: int) -> DataFrame:
    """Attach (tbl, bucket) per row, one row per hash table. n_tables=1
    stays a pure projection; n_tables>1 explodes to t rows per vector —
    OR-amplification: a pair is a candidate if it collides in ANY
    table, recovering the recall lost to a higher plane count."""
    sigs = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_signature(vec, n_planes, dim, table=t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return df.select("*", F.explode(sigs).alias("_s")).select(
        *df.columns, F.col("_s.tbl").alias("tbl"), F.col("_s.bucket").alias("bucket")
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = 8,
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket equi-join, exact re-rank
    inside buckets. Cost is per-bucket instead of all-pairs.

    n_planes=None derives the plane count from the corpus size
    (planes_for_corpus) so expected bucket size — and therefore
    per-bucket quadratic candidate cost — stays constant as the corpus
    grows; n_tables>1 adds independent hash tables (OR-amplification)
    to recover recall at high plane counts. The count() used for
    auto-derivation is metadata-cheap next to the join it sizes.
    Re-rank uses the partial top-k (see grouped_topk), not a global
    window: the exchange after scoring carries ~Q x k rows per
    partition, not every bucket candidate."""
    if n_planes is None:
        n_planes = planes_for_corpus(corpus.count())
    q = _multi_table_sig(
        queries.select(
            F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("q_vec")
        ),
        "q_vec",
        n_planes,
        dim,
        n_tables,
    )
    c = _multi_table_sig(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("c_vec")
        ),
        "c_vec",
        n_planes,
        dim,
        n_tables,
    )
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        int_dot(F.col("q_vec"), F.col("c_vec")).alias("dot"),
        int_norm_sq(F.col("q_vec")).alias("qn"),
        int_norm_sq(F.col("c_vec")).alias("cn"),
    )
    if n_tables > 1:
        # a pair colliding in several tables must count once in the
        # top-k. Dedup AFTER scoring, not before: scoring is a pure
        # deterministic map (duplicate rows are bit-identical), so
        # re-scoring a multi-collided pair costs map-side CPU only,
        # while deduping first would drag both 64-element vectors
        # through the dedup exchange — ~1 KB/row vs 5 longs/row here.
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    return grouped_topk(scored, k, carry=("qn", "cn")).select(
        "query_id",
        "neighbor_id",
        "rnk",
        "dot",
        cosine_from_int(F.col("dot"), F.col("qn"), F.col("cn")).alias("cosine"),
    )


def _vec_fingerprint(q: Column) -> Column:
    """128-bit-equivalent content fingerprint of a QUANTIZED vector:
    two independently-seeded xxhash64 passes over the integer array,
    concatenated. JVM-side (no string building of the vector itself);
    collision probability ~n^2/2^128 — the same budget the text path's
    md5 fingerprint accepts (operators/dedup.py candidate_pairs)."""
    return F.concat_ws("_", F.xxhash64(q), F.xxhash64(F.lit(42), q))


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | None = 8,
    dim: int = 64,
    n_tables: int = 1,
    bucket_cap: int | None = None,
    collapse_exact: bool = True,
    expand_members: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (near-dup
    vectors collide with high probability). n_planes=None scales the
    plane count with the corpus (constant expected bucket size);
    n_tables>1 OR-amplifies recall — see ann_lsh_topk.

    Scale shape — the two guards of the text MinHash path
    (operators/dedup.py candidate_pairs), applied to vectors:

    1. exact-collapse-first (`collapse_exact`, ON by default and
       OUTPUT-IDENTICAL): group by a fingerprint of the QUANTIZED
       vector and run the LSH self-join over ONE representative per
       distinct vector; verified pairs are fanned back out to members
       afterwards through two fingerprint-keyed joins, plus the
       within-group pairs directly (identical quantized vectors
       always share every bucket and score the same cosine, so the
       fanned-out pair list is exactly what the un-collapsed join
       would emit — byte-identical re-posted content costs the LSH
       join 1 row instead of N). The fan-out runs AFTER the cosine
       verify: only surviving rep pairs are expanded, so no vector
       payload rides the expansion joins.
    2. `bucket_cap` star overflow (opt-in — it changes the pair-level
       recall contract): buckets over the cap route to a min-id-hub
       STAR (B-1 candidate edges) instead of the B^2/2 self-join.
       Star candidates still pass the cosine verify, so a
       near-identical clique (all pairwise cosines >> threshold)
       reaches connected components fully connected at O(B) rows;
       recall of pairs BETWEEN merely-similar members of a hot bucket
       is traded away — exactly the quadratic work a CLUSTER consumer
       (CC labels, keep-one-per-group dedup) never needed. Pair-list
       consumers that threshold per-pair should leave it None.

    Output cardinality of the uncapped form is the CONTRACT's
    quadratic part: a semantic cluster of B mutually-above-threshold
    DISTINCT vectors has B^2/2 true pairs. With collapse on, that
    cost is only paid for distinct vectors; with bucket_cap it is
    bounded at O(cap * n) candidates regardless of skew.

    `expand_members=False` (cluster consumers only): skip the member
    fan-out entirely — return rep-level verified pairs plus ONE
    (rep, member) star edge per collapsed duplicate. Connected
    components over this edge set equal CC over the full pair list
    (members share their rep's signature, so every member-level pair
    is a rep-level pair expanded; the star keeps each identical-vector
    group connected through its min-id rep) at O(distinct-pairs + n)
    rows instead of O(sum B^2) — byte-identical re-posts cost the
    OUTPUT one row each, which is what drives the cluster path's
    measured scaling exponent back to ~1."""
    if n_planes is None:
        n_planes = planes_for_corpus(df.count())
    qdf = df.select(F.col(id_col), quantize(F.col(vec_col)).alias("q"))
    if collapse_exact:
        fps = qdf.select(F.col(id_col), _vec_fingerprint(F.col("q")).alias("_fp"))
        reps = fps.groupBy("_fp").agg(F.min(id_col).alias(id_col))
        rep_q = qdf.join(reps.select(id_col), id_col)
        base = rep_q
    else:
        base = qdf
    sigs = _multi_table_sig(base, "q", n_planes, dim, n_tables)
    star = None
    if bucket_cap is not None:
        from pyspark.sql import Window

        bucket = Window.partitionBy("tbl", "bucket")
        ordered = bucket.orderBy(F.col(id_col))
        counted = sigs.withColumn("_bn", F.count(F.lit(1)).over(bucket))
        hot = counted.where(F.col("_bn") > bucket_cap)
        sigs = counted.where(F.col("_bn") <= bucket_cap).drop("_bn")
        star = (
            hot.select(
                F.col(id_col),
                F.col("q"),
                F.min(F.col(id_col)).over(bucket).alias("_hub"),
                F.first("q").over(ordered).alias("_hub_q"),
            )
            .where(F.col(id_col) != F.col("_hub"))
            .select(
                F.col("_hub").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.col("_hub_q").alias("qa"),
                F.col("q").alias("qb"),
            )
        )
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.q").alias("qa"),
        F.col("b.q").alias("qb"),
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    if n_tables > 1 or star is not None:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    cos = cosine_from_int(
        int_dot(F.col("qa"), F.col("qb")),
        int_norm_sq(F.col("qa")),
        int_norm_sq(F.col("qb")),
    )
    verified = pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
    if not collapse_exact:
        return verified
    self_cos = cosine_from_int(
        int_dot(F.col("q"), F.col("q")),
        int_norm_sq(F.col("q")),
        int_norm_sq(F.col("q")),
    )
    if not expand_members:
        # CC-sufficient edge set: rep pairs as-is + one star edge per
        # collapsed member (rep = group min id, so id_a < id_b holds).
        stars = (
            fps.join(
                reps.select(F.col(id_col).alias("_rid"), "_fp"), "_fp"
            )
            .where(F.col(id_col) != F.col("_rid"))
            .join(qdf.join(reps, id_col).select("_fp", self_cos.alias("cosine")), "_fp")
            .select(
                F.col("_rid").alias("id_a"),
                F.col(id_col).alias("id_b"),
                "cosine",
            )
            .filter(F.col("cosine") >= threshold)
        )
        return verified.unionByName(stars)
    # fan representative pairs back out to members: the cosine of a
    # member pair equals the rep pair's (identical quantized vectors),
    # so the verdict AND the value transfer — two long+string-keyed
    # joins, no vector payload.
    rep_a = reps.select(F.col(id_col).alias("_ra"), F.col("_fp").alias("fp_a"))
    rep_b = reps.select(F.col(id_col).alias("_rb"), F.col("_fp").alias("fp_b"))
    with_fp = (
        verified.join(rep_a, F.col("id_a") == F.col("_ra"))
        .drop("_ra")
        .join(rep_b, F.col("id_b") == F.col("_rb"))
        .drop("_rb")
    )
    ma = fps.select(F.col("_fp").alias("fp_a"), F.col(id_col).alias("_ma"))
    mb = fps.select(F.col("_fp").alias("fp_b"), F.col(id_col).alias("_mb"))
    fanned = (
        with_fp.join(ma, "fp_a")
        .join(mb, "fp_b")
        .select(
            F.least("_ma", "_mb").alias("id_a"),
            F.greatest("_ma", "_mb").alias("id_b"),
            "cosine",
        )
    )
    # within-fingerprint pairs (byte-identical quantized vectors):
    # every bucket matches by construction, so the un-collapsed join
    # would always have scored them; score from the rep's vector with
    # itself through the SAME expression (keeps the degenerate
    # zero-vector edge identical to the uncapped self-join).
    m1 = fps.select("_fp", F.col(id_col).alias("id_a"))
    m2 = fps.select("_fp", F.col(id_col).alias("id_b"))
    within = (
        m1.join(m2, "_fp")
        .where(F.col("id_a") < F.col("id_b"))
        .join(
            qdf.join(reps, id_col).select("_fp", self_cos.alias("cosine")),
            "_fp",
        )
        .select("id_a", "id_b", "cosine")
        .filter(F.col("cosine") >= threshold)
    )
    return fanned.unionByName(within)


def _centroids_of(assigned: DataFrame, dim: int = 64) -> DataFrame:
    """(cell, qv) rows -> (cell, centroid): floor of the per-dimension
    mean of quantized vectors — exact integers, so every engine
    computes identical centroids (floor(double(s)/n): |s| < 2^53, so
    the division input is exact and the floor engine-independent).

    Shape: posexplode to (cell, pos, x), ONE two-column partial
    aggregation, then a 64-row-per-cell collect_list reassembly. The
    map-side combine collapses the explode to #cells x dim longs per
    partition before the exchange — the same wire payload as a
    dim-wide column aggregate — while keeping the expression tree
    O(1) in dim: the previous 64-parallel-SUM formulation spent
    seconds PER TRAINING ROUND on py4j column building + codegen of
    the 64-aggregate plan, which dwarfed the actual row work and
    recurred every Lloyd iteration (plans are not cached across the
    re-literalized rounds)."""
    sums = (
        assigned.select("cell", F.posexplode("qv").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .withColumn("c", F.floor(F.col("s") / F.col("n")).cast("bigint"))
    )
    return sums.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda t: t["c"]
        ).alias("centroid")
    )


def ivf_centroids(
    corpus: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF coarse quantizer from a pre-assigned cell column (a label,
    or kmeans_cells output joined back). See _centroids_of for the
    exact-integer argument."""
    q = corpus.select(F.col(cell_col).alias("cell"), quantize(F.col(vec_col)).alias("qv"))
    return _centroids_of(q, dim)


def kmeans_assign(vectors: DataFrame, centroids) -> DataFrame:
    """Assign each (vid, qv) row to its nearest centroid by exact
    integer squared euclidean distance: argmin_c ||c||^2 - 2 v.c
    (||v||^2 is constant per vector), ties to the lowest cell id —
    fully deterministic.

    MAP-ONLY: the centroid set is metadata-sized (#cells x dim longs,
    and already driver-resident in the Lloyd loop), so it enters the
    plan as a foldable literal array of (cnorm, cell, centroid)
    structs; each vector row computes its per-cell cost inside one
    projection and takes array_min over (cost, cell) — struct
    comparison is lexicographic, so the min is lowest cost then lowest
    cell id, the same tie-break the old window gave. Zero joins, zero
    exchanges: the earlier crossJoin + row_number-over-(vid) version
    shuffled #vectors x #cells rows — at IVF scale (10^10 vectors,
    10^4 cells) a 10^14-row exchange for what is arithmetically a
    per-row argmin. ||c||^2 is precomputed driver-side (exact Python
    ints) so the hot loop is one integer dot product per cell.

    `centroids` is a list of (cell, centroid) pairs or a #cells-row
    DataFrame (collected here — bounded by construction)."""
    if isinstance(centroids, DataFrame):
        rows = [(r["cell"], list(r["centroid"])) for r in centroids.collect()]
    else:
        rows = [(c, list(v)) for c, v in centroids]
    if not rows:
        # degenerate path parity with the old crossJoin form: no
        # centroids -> no assignments (not an analysis error from a
        # zero-element array literal)
        return vectors.select(
            "vid", "qv", F.lit(None).cast("int").alias("cell")
        ).limit(0)
    rows.sort()
    # ONE server-parsed SQL expression instead of per-cell py4j Column
    # building: constructing the (cnorm, cell, centroid) literals
    # through the Column API costs ~0.5s of round trips PER LLOYD
    # ROUND (8 structs x 64-long arrays); a single expr string parses
    # in milliseconds (same fast path as hyperplane_signature)
    structs = ", ".join(
        "named_struct('cnorm', {n}L, 'cell', {c}, 'centroid', array({v}))".format(
            n=sum(int(x) * int(x) for x in v),
            c=int(c),
            v=", ".join(f"{int(x)}L" for x in v),
        )
        for c, v in rows
    )
    costs = (
        f"transform(array({structs}), s -> named_struct("
        "'cost', s.cnorm - 2 * aggregate(zip_with(qv, s.centroid, (a, b) -> a * b), "
        "0L, (acc, x) -> acc + x), "
        "'cell', s.cell))"
    )
    return vectors.select(
        "vid", "qv", F.expr(f"array_min({costs}).cell").cast("int").alias("cell")
    )


def kmeans_cells(
    corpus: DataFrame,
    n_cells: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Train IVF cells with Lloyd iterations in pure DataFrame ops:
    deterministic md5-bucket init (the classic random-partition init,
    but reproducible across engines and cluster sizes), then n_iters
    rounds of (integer floor-mean centroids -> nearest-centroid
    reassignment). Everything is exact BIGINT arithmetic, so the
    trained assignment is bit-identical in any engine — the DuckDB
    oracle replays the same iterations.

    Scale shape per round: one tiny groupBy shuffle (#cells x dim
    longs) + a MAP-ONLY reassignment. The centroid table is COLLECTED
    each round (#cells x dim ints — metadata-sized, like the CC loop's
    changed-count) and folded into the next round's projection as a
    literal array (kmeans_assign), so every round's plan is flat:
    scan -> literal-argmin projection, no join, no exchange, never a
    nested re-execution of the previous round. The quantized
    vectors are cached for the duration of training. Returns
    (vid, qv, cell). A cell that loses all members simply disappears
    (deterministic in both engines)."""
    from pyspark import StorageLevel

    q = corpus.select(F.col(id_col).alias("vid"), quantize(F.col(vec_col)).alias("qv"))
    md5i = F.conv(
        F.substring(F.md5(F.col("vid").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    assigned = q.withColumn("cell", (md5i % n_cells).cast("int"))
    if n_iters > 0:
        q = q.persist(StorageLevel.MEMORY_AND_DISK)
        assigned = q.withColumn("cell", (md5i % n_cells).cast("int"))
        for _ in range(n_iters):
            cent_rows = _centroids_of(assigned, dim).collect()  # #cells rows
            assigned = kmeans_assign(q, [(r["cell"], r["centroid"]) for r in cent_rows])
    return assigned


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: rank cells by dot(query, centroid), search only
    the top-`nprobe` cells exactly, partial top-k re-rank.

    The 100 TB shape: the centroid table is tiny (#cells rows) and
    broadcast twice (probe selection, then candidate pruning); the
    corpus is scanned once with a broadcast semi-filter on (cell), so
    only ~nprobe/#cells of the data is ever scored. No all-pairs
    product, no corpus shuffle.
    """
    from pyspark.sql.window import Window

    if cents is None:
        cents = ivf_centroids(corpus, cell_col, vec_col, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("q_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cell_dot").desc(), F.col("cell")
    )
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cell_dot", int_dot(F.col("q_vec"), F.col("centroid")))
        .withColumn("cell_rnk", F.row_number().over(probe_w))
        .filter(F.col("cell_rnk") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        quantize(F.col(vec_col)).alias("c_vec"),
    )
    scored = (
        c.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", int_dot(F.col("q_vec"), F.col("c_vec")).alias("dot")
        )
    )
    return grouped_topk(scored, k).select("query_id", "neighbor_id", "rnk", "dot")


def ivf_topk_trained(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    n_cells: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    cells: DataFrame | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN over TRAINED cells: kmeans_cells replaces the label
    column — the full in-engine pipeline (train coarse quantizer ->
    build inverted file -> probe). Same probe shape as ivf_topk.

    `cells` injects a pre-trained (vid, qv, cell) frame so callers
    that also materialize the trainer output (e.g. a bench run that
    executes both the cells query and this recall query in one
    session) train once instead of twice; `cents` likewise injects the
    prebuilt cell->centroid table (the other half of the persisted
    index) so the serving path probes it instead of re-deriving it
    from a corpus scan per run."""
    if cells is None:
        cells = kmeans_cells(corpus, n_cells, n_iters, id_col, vec_col, dim)
    cells = cells.select(
        F.col("vid").alias(id_col), F.col("cell").alias("trained_cell")
    )
    corpus2 = corpus.join(cells, id_col)
    return ivf_topk(
        queries,
        corpus2,
        k,
        nprobe,
        id_col,
        vec_col,
        cell_col="trained_cell",
        dim=dim,
        cents=cents,
    )


# --- SemDeDup: semantic dedup via kmeans cells + within-cell cosine --------


def semdedup_pairs(
    cells: DataFrame, threshold: float = 0.35, block_rows: int = 2048
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): find semantic
    near-duplicate pairs by clustering embeddings with k-means and
    comparing cosine ONLY within a cluster — the trick that turns an
    O(N^2) all-pairs problem into k independent O((N/k)^2) blocks.

    `cells` is a trained (vid, qv, cell) frame from kmeans_cells.
    Returns (cell, id_a, id_b, dot, cos) for within-cell pairs with
    cosine >= threshold, id_a < id_b.

    Scale shape (100 TB): ONE hash-partition shuffle on the cell key,
    then each cell's block is scored as an integer numpy Gram matmul
    inside an Arrow applyInPandas stage — the sanctioned-Arrow
    pattern (like gram_cells): a dense X @ X.T replaces what would
    otherwise be an exploded pair join evaluating a 64-term
    higher-order-function dot per pair (measured ~6x slower at
    sf0.1, and its shuffle carries every candidate pair with both
    vectors attached; here only the input vectors and the
    above-threshold HITS ever cross the wire). At 10^10 vectors the
    operator holds because #cells is scaled with the corpus
    (SemDeDup's own recipe: cell size stays ~constant, e.g. sqrt(N)
    cells), keeping per-cell blocks executor-sized; the matmul is
    row-chunked (`block_rows`) so peak memory is block_rows x |cell|
    cells of int64, never |cell|^2. Dots are exact int64 (|qv| <=
    2^19 -> 64-dim dot < 2^44), and cos = double(dot) /
    (sqrt(double(na)) * sqrt(double(nb))) is the identical IEEE
    sequence DuckDB evaluates, so results are engine-independent
    bit-for-bit. Within-cell skew (one giant cluster) is the known
    failure mode — cap it by raising n_cells for the trainer, not by
    sampling here.
    """
    import pandas as pd

    cell_t = cells.schema["cell"].dataType.simpleString()
    out_schema = (
        f"cell {cell_t}, id_a bigint, id_b bigint, dot bigint, cos double"
    )
    chunk = int(block_rows)

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["vid"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")  # id_a < id_b <=> i < j
        ids = ids[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"cell": pdf["cell"].iloc[:0], "id_a": [], "id_b": [],
                 "dot": [], "cos": []}
            )
        X = np.stack(
            [np.asarray(v, dtype=np.int64) for v in pdf["qv"].iloc[order]]
        )
        sq = np.sqrt((X * X).sum(axis=1).astype(np.float64))
        ia, ib, dots, coss = [], [], [], []
        for s in range(0, n, chunk):
            G = X[s : s + chunk] @ X.T  # int64 — exact
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = G.astype(np.float64) / (
                    sq[s : s + chunk, None] * sq[None, :]
                )
            ri, cj = np.nonzero(cos >= threshold)  # NaN compares false
            keep = cj > ri + s  # upper triangle only
            ri, cj = ri[keep], cj[keep]
            ia.append(ids[ri + s])
            ib.append(ids[cj])
            dots.append(G[ri, cj])
            coss.append(cos[ri, cj])
        ia = np.concatenate(ia) if ia else np.empty(0, np.int64)
        return pd.DataFrame(
            {
                "cell": np.repeat(pdf["cell"].iloc[0], len(ia)),
                "id_a": ia,
                "id_b": np.concatenate(ib) if ib else np.empty(0, np.int64),
                "dot": np.concatenate(dots) if dots else np.empty(0, np.int64),
                "cos": np.concatenate(coss) if coss else np.empty(0, np.float64),
            }
        )

    return cells.select("cell", "vid", "qv").groupBy("cell").applyInPandas(
        score_cell, out_schema
    )


def semdedup_cell_report(
    cells: DataFrame, threshold: float = 0.35, pairs: DataFrame | None = None
) -> DataFrame:
    """Per-cell SemDeDup effect: (cell, n_vectors, n_dropped, n_kept)
    under the deterministic keep-min-id policy — a vector is dropped
    iff some same-cell vector with a SMALLER id sits within the
    cosine threshold (exactly SemDeDup's 'keep one per epsilon-ball',
    made reproducible). The dropped set is distinct id_b of the pair
    frame (id_a < id_b by construction). `pairs` optionally injects
    an already-materialized semdedup_pairs frame (e.g. a session
    memo) so the Gram stage runs once across consumers."""
    if pairs is None:
        pairs = semdedup_pairs(cells, threshold)
    dropped = pairs.select(F.col("id_b").alias("vid")).distinct().withColumn(
        "is_dropped", F.lit(1)
    )
    return (
        cells.select("cell", "vid")
        .join(dropped, "vid", "left")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0))).cast("bigint").alias("n_dropped"),
        )
        .withColumn("n_kept", (F.col("n_vectors") - F.col("n_dropped")).cast("bigint"))
        .orderBy("cell")
    )


def gram_cells(
    vectors: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Exact integer Gram/covariance cells: (i, j, s_ij, n, s1_i,
    s1_j) for the upper triangle (1-based dims, i <= j), where
    s_ij = sum(qv[i]*qv[j]), s1 = per-dim sums — everything int64.

    The per-partition work is ONE numpy X^T X per Arrow batch
    (int64 — exact; |qv| <= 2^19 keeps a 10^6-row batch's cell sums
    under 2^63), emitted as dim*(dim+1)/2 partial rows per batch; the
    only shuffle carries #batches x 2080 rows into a dim^2-bounded
    hash aggregation — corpus size never appears on the wire. This is
    the sanctioned-Arrow pattern (like local_topk): a linear map-side
    pass that replaces an unboundedly larger JVM explode (the
    struct-explode formulation shipped 2080 structs PER ROW and ran
    ~8x slower at sf0.1)."""
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dim)
    quant = vectors.select(quantize(F.col(vec_col)).alias("qv"))

    def per_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            g = x.T @ x
            s1 = x.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int32"),
                    "j": (ju + 1).astype("int32"),
                    "s_ij": g[iu, ju],
                    "n": np.full(len(iu), len(x), dtype=np.int64),
                    "s1_i": s1[iu],
                    "s1_j": s1[ju],
                }
            )

    partial = quant.mapInPandas(
        per_batch, "i int, j int, s_ij long, n long, s1_i long, s1_j long"
    )
    return partial.groupBy("i", "j").agg(
        F.sum("s_ij").cast("bigint").alias("s_ij"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s1_i").cast("bigint").alias("s1_i"),
        F.sum("s1_j").cast("bigint").alias("s1_j"),
    )


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — the replayable
    division both the driver-side power iteration and the DuckDB
    oracle use (Python // floors, which differs on negatives)."""
    return -((-a) // b) if a < 0 else a // b


PCA_SCALE = 1 << 20


def pca_power_iteration(
    cells_rows: list, dim: int = 64, n_iters: int = 3
) -> list[int]:
    """Dominant eigenvector of the (uncentered) Gram matrix by
    EXACT-INTEGER power iteration — every step replayable in any
    engine:

      m[i][j] = tdiv(s_ij, 2^20)         (downscale so m·v fits i64)
      v0      = [2^20] * dim
      w       = m · v                     (exact int64 sums)
      v'      = [tdiv(w_i * 2^20, max|w|)]  (renormalize to 2^20)

    The input is gram_cells' collected upper triangle (i, j, s_ij) —
    dim^2 metadata, the same driver discipline as the kmeans
    centroid collect. Sign is fixed by the deterministic all-ones
    init. Returns the scaled eigenvector (ints in [-2^20, 2^20])."""
    m = [[0] * dim for _ in range(dim)]
    for r in cells_rows:
        i, j, s = int(r["i"]) - 1, int(r["j"]) - 1, int(r["s_ij"])
        d = _tdiv(s, PCA_SCALE)
        m[i][j] = d
        m[j][i] = d
    v = [PCA_SCALE] * dim
    for _ in range(n_iters):
        w = [sum(m[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max(abs(x) for x in w) or 1
        v = [_tdiv(x * PCA_SCALE, mx) for x in w]
    return v


def pca_project(
    vectors: DataFrame, v: list[int], vec_col: str = "embedding"
) -> DataFrame:
    """Project each vector onto the scaled eigenvector: an exact
    integer dot against a foldable literal (map-only), downscaled by
    2^20 so downstream squared sums stay in int64. Adds `pc1`."""
    vec_lit = F.lit(v).cast("array<bigint>")
    raw = int_dot(quantize(F.col(vec_col)), vec_lit)
    # guarded truncating div, replayable in SQL: |raw| < 2^45 so the
    # double division is mantissa-exact and floor is exact
    red = F.when(
        raw >= 0, F.floor(raw / F.lit(PCA_SCALE))
    ).otherwise(-F.floor((-raw) / F.lit(PCA_SCALE)))
    return vectors.withColumn("pc1", red.cast("bigint"))


def kcenter_seeds(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[int]]]:
    """Farthest-point (maxmin / Gonzalez k-center) seeding: seed 0 is
    the lowest-id vector; each further seed is the vector MAXIMIZING
    its distance to the nearest already-chosen seed (ties to the
    lowest id). The classic 2-approximation to the k-center cover and
    the deterministic alternative to kmeans++ (whose sequential random
    draws have no engine-reproducible analog) — spreads initial
    centroids to the corpus extremes so Lloyd never starts with the
    md5-partition init's near-coincident centers.

    All arithmetic is exact BIGINT (full squared distance
    vnorm - 2 v.s + snorm, vnorm included — it varies across the
    candidates being ranked), so the chosen seeds are bit-identical in
    any engine. Each round is ONE map-only projection over the corpus
    (seeds enter as foldable literals, kmeans_assign-style) feeding a
    single max_by aggregate — k rounds = k scans of a persisted
    quantized frame, no joins, no shuffles beyond the 1-row agg. At
    100 TB you run this on a uniform sample (seeding quality needs
    extremes, not the full corpus); the plan shape is unchanged.

    Returns [(cell, centroid_ints)] with cells numbered in pick order.
    """
    from pyspark import StorageLevel

    q = corpus.select(
        F.col(id_col).alias("vid"), quantize(F.col(vec_col)).alias("qv")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    first = q.select(
        F.expr("min_by(named_struct('vid', vid, 'qv', qv), vid)").alias("p")
    ).collect()[0]["p"]
    seeds: list[tuple[int, list[int]]] = [(0, [int(x) for x in first["qv"]])]
    vnorm = "aggregate(zip_with(qv, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
    for j in range(1, k):
        structs = ", ".join(
            "named_struct('snorm', {n}L, 'centroid', array({v}))".format(
                n=sum(x * x for x in v), v=", ".join(f"{x}L" for x in v)
            )
            for _, v in seeds
        )
        mind = (
            f"array_min(transform(array({structs}), s -> s.snorm"
            " - 2 * aggregate(zip_with(qv, s.centroid, (a, b) -> a * b),"
            f" 0L, (acc, x) -> acc + x))) + {vnorm}"
        )
        pick = q.select(
            F.expr(
                "max_by(named_struct('vid', vid, 'qv', qv),"
                f" named_struct('d', {mind}, 'nv', -vid))"
            ).alias("p")
        ).collect()[0]["p"]
        seeds.append((j, [int(x) for x in pick["qv"]]))
    q.unpersist()
    return seeds
