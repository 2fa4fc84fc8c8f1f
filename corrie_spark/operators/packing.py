"""Training-data packing operators: document chunking and token-budget
shard assignment.

Both are deterministic (hash-ordered, no rand()) so corpus builds are
reproducible across runs, engines, and cluster sizes — the same
property as the train/test splits in queries/text_queries.py.

`distributed_cumsum` is the scale-critical piece: a naive
`SUM(x) OVER (ORDER BY k)` collapses to ONE partition in Spark (a
global sort window), the classic 100 TB faceplant. The two-phase
prefix sum — range-partition by key, per-partition window, then add
broadcast per-partition offsets — keeps every stage parallel; the
driver only ever sees #partitions partial sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks with
    stable (doc_id, chunk_idx) identity — the standard pre-training /
    RAG chunking step.

    stride = chunk_tokens - overlap; chunk i covers tokens
    [i*stride, i*stride + chunk_tokens); the last chunk is the one
    whose start first reaches the tail (docs of <= chunk_tokens tokens
    yield exactly one chunk). Row-local: tokenization, the chunk-index
    sequence, and the slice all happen inside one projection — a pure
    map stage at any scale, no shuffle, no UDF.
    """
    from corrie_spark.functions import bind
    from corrie_spark.operators.text import tokens

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def build(toks: Column) -> Column:
        n = F.size(toks)
        n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                F.slice(toks, i * stride + 1, chunk_tokens).alias("chunk"),
            ),
        )

    chunks = df.select(
        F.col(id_col), F.explode(bind(tokens(F.col(text_col)), build)).alias("c")
    )
    chunk_text = F.concat_ws(" ", F.col("c.chunk"))
    return chunks.select(
        F.col(id_col),
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.chunk").cast("long").alias("n_tokens"),
        F.md5(chunk_text).alias("chunk_fp"),
    )


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
    key_bound: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exclusive prefix sum of `value_col` in `order_col` order,
    without a single-partition global window.

    Phase 1: split the key axis into mutually ordered buckets, local
    running sum via a window PARTITIONED by the bucket id. Phase 2:
    per-bucket totals (#buckets rows) come to the driver, their
    exclusive prefix is broadcast back as a join on the bucket id.
    Result: cumsum BEFORE each row — every stage parallel, driver
    traffic O(#buckets).

    Bucketing: when `key_bound` is given, order_col is a NUMERIC key
    uniform on [0, key_bound) (the hash60 callers) and the bucket id
    is computed arithmetically — floor(key / width). When it is not,
    the general path range-partitions on order_col (a sampling pass
    over the input) and uses the physical partition id. The computed
    form removes the sampling job AND one exchange (the window's
    partitionBy cannot see that range partitioning already grouped
    the rows by pid, so it re-shuffles hash(_pid) on top of the range
    exchange); bucket boundaries differ between the two forms but the
    cumsum is a pure function of (key order, values) — identical
    output either way, whatever the bucketing.

    order_col must be globally unique (it is a hash in every caller
    here); ties would make "before" ambiguous.

    `group_cols` computes INDEPENDENT cumsums per group in the same
    single pass (window partitioned by (group, bucket), per-group
    driver prefix) — what pack_splits needs to pack all three splits
    in one job instead of three full scans. Requires `key_bound`
    (the arithmetic-bucket form; every caller here is hash-keyed).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if group_cols and key_bound is None:
        raise ValueError("group_cols requires key_bound (arithmetic buckets)")
    gcols = list(group_cols or [])
    if key_bound is not None:
        # 8x more buckets than target partitions so the hash exchange
        # spreads them evenly (guide §2.5: too few distinct synthetic
        # keys leaves partitions holding 2 buckets and others none);
        # totals stay metadata-sized (#buckets rows to the driver)
        n_buckets = parts * 8
        width = max(1, (int(key_bound) + n_buckets - 1) // n_buckets)
        ranged = df.withColumn(
            "_pid",
            F.least(
                F.floor(F.col(order_col) / F.lit(width)), F.lit(n_buckets - 1)
            ).cast("int"),
        )
    else:
        ranged = (
            df.repartitionByRange(parts, F.col(order_col))
            .sortWithinPartitions(order_col)
            .withColumn("_pid", F.spark_partition_id())
        )
    w = (
        Window.partitionBy(*gcols, "_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local_before", F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long")
    # materialize once: both the totals collect below and the returned
    # join read this — without it the repartitionByRange + window
    # pipeline would execute twice (the exact 2x the operator exists
    # to avoid)
    ).localCheckpoint(eager=True)
    totals = (
        local.groupBy(*gcols, "_pid")
        .agg(F.sum(value_col).cast("long").alias("_tot"))
        .collect()
    )  # #groups x #buckets rows — metadata-sized at any data scale
    offset_rows: list[tuple] = []
    acc_of: dict[tuple, int] = {}
    for r in sorted(totals, key=lambda r: (tuple(repr(r[g]) for g in gcols), r._pid)):
        g = tuple(r[gc] for gc in gcols)
        acc = acc_of.get(g, 0)
        offset_rows.append(g + (r._pid, acc))
        acc_of[g] = acc + (r._tot or 0)
    gschema = "".join(f"{g} string, " for g in gcols)
    offsets = df.sparkSession.createDataFrame(
        offset_rows, gschema + "_pid int, _offset long"
    )
    return (
        local.join(F.broadcast(offsets), gcols + ["_pid"])
        .withColumn(out_col, (F.col("_local_before") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local_before", "_offset")
    )


def pack_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    salt: str = "pack",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Assign rows to training shards of ~`budget` tokens each:
    deterministic hash order, exclusive running token count, shard =
    cumsum_before // budget (a row straddling a boundary goes to the
    shard its first token lands in). Reproducible bin packing without
    a coordinator — the step that turns a deduped corpus into
    fixed-size training shards. `group_cols` packs each group
    independently in the same single pass (see distributed_cumsum) —
    identical output to filtering per group and unioning."""
    from corrie_spark.operators.dedup import hash60

    keyed = df.withColumn("_h", hash60(F.col(id_col).cast("string"), salt=salt))
    summed = distributed_cumsum(
        keyed, "_h", tokens_col, out_col="_before", key_bound=1 << 60,
        group_cols=group_cols,
    )
    return summed.withColumn(
        "shard", F.floor(F.col("_before") / F.lit(budget)).cast("long")
    ).drop("_before", "_h")


def pack_with_offsets(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    salt: str = "pack",
) -> DataFrame:
    """pack_shards plus each row's CONCATENATION OFFSET inside its
    shard (`offset_in_shard` = this row's exclusive running size minus
    the shard's first row's) — what sequence-packing needs to re-base
    per-document annotations (loss-mask spans, char-level labels) into
    packed-sequence coordinates. The min window rides the shard
    exchange the packer's consumers need anyway."""
    from pyspark.sql import Window

    from corrie_spark.operators.dedup import hash60

    keyed = df.withColumn("_h", hash60(F.col(id_col).cast("string"), salt=salt))
    summed = distributed_cumsum(
        keyed, "_h", size_col, out_col="_before", key_bound=1 << 60
    )
    sharded = summed.withColumn(
        "shard", F.floor(F.col("_before") / F.lit(budget)).cast("long")
    )
    w = Window.partitionBy("shard")
    return sharded.withColumn(
        "offset_in_shard",
        (F.col("_before") - F.min("_before").over(w)).cast("long"),
    ).drop("_before")


def token_budget_sample(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic token-budget mixture sampling: per source, take
    documents in hash-shuffled order until the source's running token
    count reaches `budget` — the step that turns per-source sampling
    weights into an actual training mix ("200B tokens of web, 50B of
    code") reproducibly, with no coordinator and no rand().

    A row is kept iff its EXCLUSIVE per-source running count is below
    the budget, so each source overshoots by at most one document and
    selection of any row is independent of how the cluster is
    partitioned.

    Scale shape: ONE global two-phase prefix sum (distributed_cumsum
    over the composite key source \\x01 hash — range partition, local
    windows, #partitions broadcast offsets; never a single-partition
    global window). Per-source exclusive counts derive from the
    global ones by subtracting each source's first global value — a
    #sources-row aggregate, broadcast back. Sources are contiguous in
    the composite order because \\x01 sorts below every printable
    character (source names must not contain \\x01).

    Returns (source, doc_id, n_tokens, before_tokens) for the kept
    rows; `before_tokens` is the per-source exclusive running count,
    i.e. how far into the budget this document starts."""
    from corrie_spark.operators.dedup import hash60

    okey = F.concat(
        F.col(source_col),
        F.lit("\x01"),
        F.lpad(hash60(F.col(id_col).cast("string"), salt=salt).cast("string"), 20, "0"),
        F.lit("\x01"),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),  # tie-break: unique order key
    )
    keyed = df.withColumn("_k", okey)
    summed = distributed_cumsum(keyed, "_k", tokens_col, out_col="_gbefore")
    # each source's global-cumsum value at its first row IS its offset
    # (contiguity argument above); #sources rows, broadcast back
    offsets = summed.groupBy(source_col).agg(F.min("_gbefore").alias("_off"))
    return (
        summed.join(F.broadcast(offsets), source_col)
        .withColumn("before_tokens", (F.col("_gbefore") - F.col("_off")).cast("long"))
        .filter(F.col("before_tokens") < budget)
        .select(source_col, id_col, tokens_col, "before_tokens")
    )


def temperature_sample(
    df: DataFrame,
    temperature: float = 2.0,
    scale: int = 1 << 30,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    source_col: str = "source",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened mixture sampling (the multilingual-LM
    recipe: p_s ∝ w_s^(1/T), T > 1 upweights small sources). Each
    source's ACCEPTANCE probability is q_s = p_s / max_s(p_s) — the
    largest source keeps everything, smaller sources keep a larger
    fraction than their raw share — and a document is kept iff
    hash60(id) % scale < floor(q_s * scale): deterministic Bernoulli,
    reproducible on any cluster/partitioning, no rand().

    T=2 keeps the cross-engine determinism airtight: w^(1/2) is one
    IEEE sqrt. Other temperatures go through pow(), also
    correctly-rounded on every platform libm we target, but sqrt is
    the contract the oracle pins.

    Scale shape: per-source token totals are a #sources-row aggregate
    broadcast back into the scan's projection; the accept test is a
    pure map — the only shuffle is the final report aggregation.
    """
    from corrie_spark.operators.dedup import hash60

    totals = df.groupBy(source_col).agg(
        F.sum(tokens_col).cast("bigint").alias("_w")
    )
    p = F.sqrt(F.col("_w").cast("double")) if temperature == 2.0 else F.pow(
        F.col("_w").cast("double"), 1.0 / temperature
    )
    weighted = totals.select(source_col, p.alias("_p"))
    pmax = weighted.agg(F.max("_p").alias("_pmax"))
    thresholds = weighted.crossJoin(F.broadcast(pmax)).select(
        source_col,
        F.floor(F.col("_p") / F.col("_pmax") * F.lit(scale)).cast("bigint").alias("_thr"),
    )
    keyed = df.join(F.broadcast(thresholds), source_col).withColumn(
        "_h", hash60(F.col(id_col).cast("string"), salt=salt) % F.lit(scale)
    )
    return keyed.withColumn("kept", F.col("_h") < F.col("_thr")).drop("_h", "_thr")
