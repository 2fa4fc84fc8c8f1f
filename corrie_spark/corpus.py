"""End-to-end training-corpus build: the composition every other
operator in this repo exists for, as ONE DataFrame program.

    raw documents
      -> exact dedup        (md5 fingerprint, keep-min-id)
      -> near-dedup         (MinHash-LSH -> connected components,
                             keep the min-id representative)
      -> quality filter     (Gopher-style feature gates)
      -> boilerplate strip  (duplicated-passage removal)
      -> leakage-free split (bucket hashed from the near-dup cluster)
      -> shard packing      (deterministic ~budget-token shards)
      -> parquet, partitioned by split

plus a driver-side MANIFEST (per-stage survivor counts, per-split
shard/token totals) whose size is #stages + #splits + #shards —
metadata, never rows.

Scale shape: each stage is one of the already-audited operators (see
their module docstrings for the 100 TB arguments); the composition
adds NO extra scans — stages chain lazily and Spark pipelines the
maps between the shuffles each stage owns. Every decision is
hash-deterministic, so two runs over the same snapshot — on any
cluster size or partitioning — produce byte-identical shards
(pinned by tests/test_corpus_build.py).

Determinism note on the near-dedup stage: connected_components is
iterative (localCheckpoint rounds), so the build materializes the
cluster map once and reuses it for both survivor choice and split
assignment — the same frame, not a recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.functions.core import bind
from corrie_spark.operators import dedup as D
from corrie_spark.operators import passages as P
from corrie_spark.operators import text as T
from corrie_spark.operators.packing import pack_shards

# Gopher-style gates (same corpus-tuned constants as q_corpus_filter)
NTOK_MIN, NTOK_MAX = 10, 500
MTL_MIN, MTL_MAX = 2.0, 10.0
STOP_MIN = 0.03
PUNCT_MAX = 0.2

SHARD_BUDGET_TOKENS = 4000


def corpus_stages(
    spark: SparkSession,
    docs: DataFrame,
    strip_n: int = P.DEFAULT_PASSAGE_N,
    clusters: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> dict:
    """The build as LAZY stage frames (no writes, no counts) — shared
    by build_corpus (which writes shards) and q_corpus_manifest
    (which oracle-checks every stage boundary end-to-end). `clusters`
    comes back persisted (iterative CC lineage must be materialized
    once, not replayed per consumer); callers unpersist when done.

    `clusters` optionally injects a precomputed (doc_id, cluster_id)
    near-dup cluster map over the RAW docs (e.g. the session-shared
    memo the dedup queries use): restricting an all-docs clustering
    to the exact-dedup survivors yields EXACTLY the clustering this
    pipeline computes itself, because an exact duplicate has a
    bit-identical MinHash signature to its keeper — every band edge
    through a removed duplicate also exists through its keeper
    (connectivity preserved), and each component's min id is itself
    a keeper (a fp-group's keeper IS that group's min id). Injection
    turns the build's most expensive stage into a reused artifact."""
    from pyspark import StorageLevel

    # 1. exact dedup: keep the min doc_id per md5 fingerprint.
    # Stage boundaries are persisted MEMORY_AND_DISK: every boundary
    # feeds >= 2 consumers (the next stage + the manifest count), and
    # without the persist each consumer replays every upstream
    # shuffle (measured ~4x the work at sf0.1). At 100 TB the same
    # role is played by checkpointing stage outputs to parquet;
    # MEMORY_AND_DISK is the single-job equivalent (spills, never
    # OOMs).
    exact = D.deduplicate_exact(docs, id_col="doc_id", text_col="text").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # 2. near-dedup: LSH pair graph -> CC -> keep cluster representative.
    if clusters is not None:
        clusters = clusters.join(exact.select("doc_id"), "doc_id").persist()
    else:
        # `sigs` optionally injects a pre-built (doc_id, sig) MinHash
        # frame over a SUPERSET of docs (e.g. the session-shared
        # signature memo over the raw corpus): the signature is a pure
        # per-document function of the text, so candidate_pairs'
        # rep-semi-join restricts it to exactly the signatures it
        # would have computed — the md5-heavy shingle scan runs zero
        # times here instead of once.
        pairs = D.candidate_pairs(
            exact, id_col="doc_id", text_col="text", sigs=sigs
        ).select("id_a", "id_b")
        clusters = D.connected_components(
            pairs, exact.select("doc_id"), id_col="doc_id"
        ).persist()
    survivors = exact.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
        "doc_id",
    )

    # 3. quality gates (one bound features struct, all rules combined
    # inside the lambda so the pipeline evaluates once per row — four
    # separate field references each re-ran it before)
    keep = bind(
        T.quality_features("text"),
        lambda s: s["n_tokens"].between(NTOK_MIN, NTOK_MAX)
        & s["mean_token_len"].between(MTL_MIN, MTL_MAX)
        & (s["stopword_ratio"] >= STOP_MIN)
        & (s["punct_ratio"] <= PUNCT_MAX),
    )
    gated = survivors.filter(keep).persist(StorageLevel.MEMORY_AND_DISK)

    # 4. strip duplicated passages (computed over the SURVIVOR corpus:
    # boilerplate shared only by dropped near-dups is already gone)
    stripped = (
        P.strip_duplicated_passages(gated, n=strip_n)
        .filter(F.length("clean_text") > 0)
        .select("doc_id", F.col("clean_text").alias("text"), "n_tokens", "n_removed")
    )

    # 5. leakage-free split: bucket by the near-dup cluster id
    bucket = D.hash60(F.col("cluster_id").cast("string"), salt="split") % 1000
    split = (
        F.when(bucket < 900, "train").when(bucket < 950, "val").otherwise("test")
    )
    assigned = stripped.join(clusters, "doc_id").select(
        "doc_id",
        "text",
        (F.col("n_tokens") - F.col("n_removed")).alias("n_tokens"),
        split.alias("split"),
    )
    return {
        "exact": exact,
        "clusters": clusters,
        "survivors": survivors,
        "gated": gated,
        "assigned": assigned.persist(StorageLevel.MEMORY_AND_DISK),
    }


def pack_splits(assigned: DataFrame, shard_budget: int) -> DataFrame:
    """Shard-pack each split independently (~budget tokens, hash
    order) — ONE grouped-cumsum pass over `assigned` instead of three
    filtered scans + three checkpoint/collect rounds (round-15;
    identical rows, pinned by tests/test_corpus_build.py)."""
    return pack_shards(
        assigned, "doc_id", "n_tokens", shard_budget, group_cols=["split"]
    )


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    shard_budget: int = SHARD_BUDGET_TOKENS,
    strip_n: int = P.DEFAULT_PASSAGE_N,
) -> dict:
    """Run the full build over a `documents`-shaped frame (doc_id,
    text, lang, source, n_chars) and write
    `<out_dir>/corpus` (parquet, partitioned by split). Returns the
    manifest dict (also what a driver would log per snapshot)."""
    st = corpus_stages(spark, docs, strip_n=strip_n)
    n_raw = docs.count()
    n_exact = st["exact"].count()
    n_near = st["survivors"].count()
    n_quality = st["gated"].count()
    clusters = st["clusters"]
    assigned = st["assigned"]

    # 6. shard packing per split (~budget tokens per shard, hash order)
    packed = pack_splits(assigned, shard_budget)
    packed.write.mode("overwrite").partitionBy("split").parquet(f"{out_dir}/corpus")

    out = spark.read.parquet(f"{out_dir}/corpus")
    per_split = {
        r["split"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "n_shards": r["n_shards"],
        }
        for r in out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("shard").alias("n_shards"),
        )
        .collect()
    }
    for k in ("exact", "gated", "assigned", "clusters"):
        st[k].unpersist()
    return {
        "n_raw": n_raw,
        "n_after_exact_dedup": n_exact,
        "n_after_near_dedup": n_near,
        "n_after_quality": n_quality,
        "n_written": sum(s["n_docs"] for s in per_split.values()),
        "splits": per_split,
    }


def build_clusters_stage(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    strip_n: int = P.DEFAULT_PASSAGE_N,
    sigs: DataFrame | None = None,
) -> bool:
    """Build ONLY the stages/clusters table of a staged build — the
    single artifact refresh_corpus_staged reads from the base
    snapshot. A caller that is about to refresh (fold a batch in)
    must not pay for the base assigned/pack stages: the refresh
    rewrites every downstream stage table over the COMBINED corpus
    anyway, so building them first is thrown-away work (measured
    ~10 s of the 23.6 s incremental-manifest build at sf0.1).
    Returns True when the stage ran, False when it was already done.
    Nothing is materialized beyond the clusters lineage (exact dedup
    + LSH pair graph + CC): corpus_stages is lazy and the downstream
    persists are never touched."""
    import os

    clusters_path = f"{out_dir}/stages/clusters"
    if os.path.exists(f"{clusters_path}/_STAGE_DONE"):
        return False
    st = corpus_stages(spark, docs, strip_n=strip_n, sigs=sigs)
    st["clusters"].write.mode("overwrite").parquet(clusters_path)
    with open(f"{clusters_path}/_STAGE_DONE", "w") as f:
        f.write("ok\n")
    for k in ("exact", "gated", "assigned", "clusters"):
        st[k].unpersist()
    return True


def build_corpus_staged(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    shard_budget: int = SHARD_BUDGET_TOKENS,
    strip_n: int = P.DEFAULT_PASSAGE_N,
    clusters: DataFrame | None = None,
) -> dict:
    """Restartable build: every stage boundary is CHECKPOINTED as a
    parquet stage table under <out_dir>/stages/, and a rerun SKIPS
    any stage whose output already exists — the operational shape of
    a multi-hour 100 TB build, where a failure at shard-packing must
    not re-pay the near-dedup pass. (build_corpus's in-memory
    persists are the single-job equivalent; this is the multi-job /
    resumable variant.)

    Stage tables and their producers:
      stages/clusters   (doc_id, cluster_id)   exact-dedup + LSH + CC
      stages/assigned   (doc_id, text, n_tokens, split)
                        gates + strip + split over the cluster table
      corpus/           final packed shards (partitioned by split)

    Resume contract: a stage counts as done only when its
    _STAGE_DONE marker exists, written strictly AFTER the parquet
    commit returns (a killed write leaves no marker and the rerun
    rewrites the stage; dynamic-partition-overwrite suppresses
    Spark's own _SUCCESS, so the explicit marker is load-bearing for
    the packed output). Each stage is a pure function of its
    upstream table, so skipping is always sound. Delete a stage dir
    to force its recompute (e.g. after changing gate thresholds).

    Returns the same manifest as build_corpus plus a `stages_run`
    list showing what actually executed this invocation.

    Stage-boundary counts (n_raw / n_after_exact_dedup /
    n_after_near_dedup / n_after_quality) are recorded in
    `stages/COUNTS.json` the first time the stages run, so a resumed
    or read-only consumer (q_corpus_manifest's warm path) can report
    the full manifest without replaying the build. The counts are
    taken from the SAME persisted boundary frames the build flows
    through — not a separate pass."""
    import json as _json
    import os

    stages_dir = f"{out_dir}/stages"
    counts_path = f"{stages_dir}/COUNTS.json"
    ran: list[str] = []

    def done(path: str) -> bool:
        return os.path.exists(f"{path}/_STAGE_DONE")

    def mark(path: str) -> None:
        with open(f"{path}/_STAGE_DONE", "w") as f:
            f.write("ok\n")

    st: dict | None = None

    def teardown():
        if st is not None:
            for k in ("exact", "gated", "assigned", "clusters"):
                st[k].unpersist()

    clusters_path = f"{stages_dir}/clusters"
    if not done(clusters_path):
        # `clusters` optionally injects a precomputed all-docs cluster
        # map (see corpus_stages: restriction to the exact survivors
        # is provably the same clustering) so a caller holding the
        # session-shared map does not re-run exact+LSH+CC here
        st = corpus_stages(spark, docs, strip_n=strip_n, clusters=clusters)
        st["clusters"].write.mode("overwrite").parquet(clusters_path)
        mark(clusters_path)
        ran.append("clusters")

    assigned_path = f"{stages_dir}/assigned"
    if not done(assigned_path):
        if st is None:
            # resume: rebuild downstream stages from the stored table
            st = corpus_stages(
                spark, docs, strip_n=strip_n,
                clusters=spark.read.parquet(clusters_path),
            )
        st["assigned"].write.mode("overwrite").parquet(assigned_path)
        mark(assigned_path)
        ran.append("assigned")
    if st is not None:
        # boundary frames are persisted by corpus_stages; these counts
        # read the caches the write above already filled. REWRITTEN
        # whenever any stage actually recomputed (st is only built
        # inside a stage-ran branch) — a forced recompute (deleted
        # stage dir, e.g. after changing gate thresholds) must not
        # leave stale boundary counts behind for the warm manifest
        # path to serve as current. Write-then-rename so a build
        # killed mid-write never leaves a truncated COUNTS.json.
        tmp = f"{counts_path}.tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {
                    "n_raw": docs.count(),
                    "n_after_exact_dedup": st["exact"].count(),
                    "n_after_near_dedup": st["survivors"].count(),
                    "n_after_quality": st["gated"].count(),
                },
                f,
            )
        os.replace(tmp, counts_path)
    teardown()
    assigned = spark.read.parquet(assigned_path)

    corpus_path = f"{out_dir}/corpus"
    if not done(corpus_path):
        pack_splits(assigned, shard_budget).write.mode("overwrite").partitionBy(
            "split"
        ).parquet(corpus_path)
        mark(corpus_path)
        ran.append("pack")

    out = spark.read.parquet(corpus_path)
    per_split = {
        r["split"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "n_shards": r["n_shards"],
        }
        for r in out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("shard").alias("n_shards"),
        )
        .collect()
    }
    boundary = (
        _json.load(open(counts_path)) if os.path.exists(counts_path) else {}
    )
    return {
        "n_raw": boundary.get("n_raw", docs.count()),
        **{k: v for k, v in boundary.items() if k != "n_raw"},
        "n_written": sum(s["n_docs"] for s in per_split.values()),
        "splits": per_split,
        "stages_run": ran,
    }


def incremental_clusters(
    spark: SparkSession,
    base_survivors: DataFrame,
    batch: DataFrame,
    base_clusters: DataFrame,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup clustering: merge an incoming `batch` into
    an existing cluster map WITHOUT replaying the base x base pair
    join or the full-graph CC — the dominant cost of a corpus
    rebuild. Returns (doc_id, cluster_id) over base survivors UNION
    batch, EXACTLY equal to clustering the combined corpus from
    scratch (pinned by tests/test_corpus_build.py):

      1. MinHash bands for both sides (map-only scans);
      2. candidate edges = batch bands JOIN (base UNION batch) bands —
         only batch-adjacent pairs; base x base never joins again;
      3. CONTRACT each base component to its cluster_id supernode
         (base-base connectivity is already encoded in the map), then
         pointer-jumping CC over the contracted graph: nodes are
         batch ids + base cluster ids, edges only the new ones;
      4. relabel: a base doc inherits its old component's new label,
         a batch doc its own.

    Exactness: contracting connected subgraphs preserves reachability,
    and every label is the min id of the merged component because a
    base component's cluster_id IS its min member id. At 100 TB the
    per-crawl cost is |batch| signatures + one band equi-join keyed
    away from the corpus bulk + CC over a graph whose base side is
    one node per EXISTING cluster, not one per document."""
    from pyspark import StorageLevel

    def bands(df: DataFrame) -> DataFrame:
        # `sigs` (optional): pre-built signatures over a superset of
        # df — MinHash is a pure per-doc function of the text, so the
        # id-join restriction is identical to recomputing
        s = (
            D.with_minhash(df, "text").select("doc_id", "sig")
            if sigs is None
            else sigs.select("doc_id", "sig").join(df.select("doc_id"), "doc_id")
        )
        return s.select(
            "doc_id",
            F.posexplode(D.lsh_bands(F.col("sig"))).alias("band_idx", "band_hash"),
        )

    batch_bands = bands(batch).persist(StorageLevel.MEMORY_AND_DISK)
    all_bands = bands(base_survivors).unionByName(batch_bands)
    a, b = batch_bands.alias("a"), all_bands.alias("b")
    cand = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))

    # contract: base endpoint -> its existing cluster_id; batch -> itself
    cmap = base_clusters.select(
        F.col("doc_id").alias("_d"), F.col("cluster_id").alias("_c")
    )
    edges = (
        cand.join(cmap, cand.id_a == cmap._d, "left")
        .select(F.coalesce("_c", "id_a").alias("id_a"), "id_b")
        .join(cmap, F.col("id_b") == cmap._d, "left")
        .select("id_a", F.coalesce("_c", "id_b").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    nodes = (
        base_clusters.select(F.col("cluster_id").alias("doc_id"))
        .distinct()
        .unionByName(batch.select("doc_id"))
    )
    labels = D.connected_components(edges, nodes).select(
        F.col("doc_id").alias("_node"), F.col("cluster_id").alias("_cid")
    )
    out = (
        base_clusters.join(labels, base_clusters.cluster_id == F.col("_node"))
        .select("doc_id", F.col("_cid").alias("cluster_id"))
        .unionByName(
            batch.select("doc_id")
            .join(labels, F.col("doc_id") == F.col("_node"))
            .select("doc_id", F.col("_cid").alias("cluster_id"))
        )
    )
    batch_bands.unpersist()
    return out


def refresh_corpus_staged(
    spark: SparkSession,
    base_docs: DataFrame,
    batch_docs: DataFrame,
    out_dir: str,
    shard_budget: int = SHARD_BUDGET_TOKENS,
    strip_n: int = P.DEFAULT_PASSAGE_N,
    sigs: DataFrame | None = None,
) -> dict:
    """INCREMENTAL staged refresh: fold a new crawl batch into a
    COMPLETED build_corpus_staged(base_docs, out_dir) without paying
    the base x base near-dedup again. The cluster stage updates via
    incremental_clusters (batch-adjacent edges + contracted CC); the
    corpus-GLOBAL downstream stages (quality gates, duplicated-passage
    strip, split, pack) recompute over the combined corpus — they
    must, because a passage duplicated only between a new and an old
    doc changes the old doc's stripped text too. COUNTS.json and
    every stage table are rewritten, so the refreshed stage dir is
    indistinguishable from (and hash-equal to) a from-scratch rebuild
    on base+batch — the invariant the incremental path lives by
    (oracle-checked end to end by q_corpus_incremental)."""
    import os

    stages_dir = f"{out_dir}/stages"
    clusters_path = f"{stages_dir}/clusters"
    if not os.path.exists(f"{clusters_path}/_STAGE_DONE"):
        raise FileNotFoundError(
            f"refresh requires a completed staged build under {out_dir}"
        )
    base_clusters = spark.read.parquet(clusters_path)
    base_survivors = base_docs.join(base_clusters.select("doc_id"), "doc_id")
    merged = incremental_clusters(
        spark, base_survivors, batch_docs, base_clusters, sigs=sigs
    ).localCheckpoint()  # sever lineage from the stage table BEFORE overwrite

    docs = base_docs.unionByName(batch_docs)
    st = corpus_stages(spark, docs, strip_n=strip_n, clusters=merged)
    st["clusters"].write.mode("overwrite").parquet(clusters_path)
    st["assigned"].write.mode("overwrite").parquet(f"{stages_dir}/assigned")
    with open(f"{stages_dir}/assigned/_STAGE_DONE", "w") as f:
        f.write("ok\n")

    import json as _json

    counts_path = f"{stages_dir}/COUNTS.json"
    tmp = f"{counts_path}.tmp"
    with open(tmp, "w") as f:
        _json.dump(
            {
                "n_raw": docs.count(),
                "n_after_exact_dedup": st["exact"].count(),
                "n_after_near_dedup": st["survivors"].count(),
                "n_after_quality": st["gated"].count(),
            },
            f,
        )
    os.replace(tmp, counts_path)

    corpus_path = f"{out_dir}/corpus"
    pack_splits(
        spark.read.parquet(f"{stages_dir}/assigned"), shard_budget
    ).write.mode("overwrite").partitionBy("split").parquet(corpus_path)
    with open(f"{corpus_path}/_STAGE_DONE", "w") as f:
        f.write("ok\n")

    out = spark.read.parquet(corpus_path)
    per_split = {
        r["split"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "n_shards": r["n_shards"],
        }
        for r in out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("shard").alias("n_shards"),
        )
        .collect()
    }
    boundary = _json.load(open(counts_path))
    for k in ("exact", "gated", "assigned", "clusters"):
        st[k].unpersist()
    return {
        **boundary,
        "n_written": sum(s["n_docs"] for s in per_split.values()),
        "splits": per_split,
        "stages_run": ["incremental_clusters", "assigned", "pack"],
    }
