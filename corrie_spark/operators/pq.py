"""Product quantization (PQ) for vector search at 100 TB scale.

PQ is the third leg of the ANN stool next to LSH (similarity.py
hyperplane buckets) and IVF (coarse cells): split each vector into
`n_sub` subspaces, learn a tiny per-subspace codebook, and store each
vector as `n_sub` small codes — here 8 codes x 16 centroids = 8 bytes
per vector against 512 bytes of raw float64s (64x compression), which
is what lets a 10^10-vector corpus live in cluster memory. Scoring is
asymmetric distance computation (ADC): each query precomputes a
(n_sub x n_codes) lookup table of exact subspace dot products once,
and every corpus candidate costs n_sub table lookups + adds — no
full-dimension arithmetic in the hot loop.

Everything is exact BIGINT arithmetic on the quantized vectors (same
discipline as similarity.kmeans_cells): md5-bucket codebook init,
floor-mean centroids, argmin encode with ties to the lowest code —
so training, codes, and ADC scores are bit-identical in any engine
and the DuckDB oracle replays them.

Reference parity: the reference engine has no vector surface at all —
this module is part of the beyond-parity training-data-pipeline
surface (SURVEY §2 "LLM-data ops").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corrie_spark.functions.core import bind
from corrie_spark.operators.similarity import int_dot, quantize

N_SUB = 8
N_CODES = 16
SUB_DIM = 8


def _init_code(m: int, n_codes: int) -> Column:
    """Deterministic md5-bucket init for subspace m — reproducible
    across engines and cluster sizes (cf. similarity.kmeans_cells)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("vid").cast("string"), F.lit(f":{m}"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h % n_codes).cast("int")


def pq_codebooks(
    corpus: DataFrame,
    n_sub: int = N_SUB,
    n_codes: int = N_CODES,
    sub_dim: int = SUB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = False,
) -> list[list[tuple[int, list[int]]]]:
    """Train per-subspace codebooks (one floor-mean round over the
    md5 init — the same 1-iteration Lloyd the IVF trainer starts
    from). Returns books[m] = sorted [(code, centroid)], collected:
    n_sub x n_codes x sub_dim ints is metadata-sized at any corpus
    scale, like the IVF centroid table.

    Plan: one exploded pass over the corpus (n_sub structs per row,
    map-side combined) -> ONE shuffle of n_sub x n_codes groups."""
    qv_col = F.col(vec_col) if quantized else quantize(F.col(vec_col))
    q = corpus.select(F.col(id_col).alias("vid"), qv_col.alias("qv"))
    sub = q.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("qv", m * sub_dim + 1, sub_dim).alias("sv"),
                        _init_code(m, n_codes).alias("j"),
                    )
                    for m in range(n_sub)
                ]
            )
        ).alias("e")
    ).select("e.m", "e.sv", "e.j")
    sums = sub.groupBy("m", "j").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("sv", d + 1)).alias(f"s{d}") for d in range(sub_dim)],
    )
    cent = F.array(
        *[F.floor(F.col(f"s{d}") / F.col("n")).cast("bigint") for d in range(sub_dim)]
    )
    rows = sums.select("m", "j", cent.alias("centroid")).collect()
    books: list[list[tuple[int, list[int]]]] = [[] for _ in range(n_sub)]
    for r in rows:
        books[r["m"]].append((int(r["j"]), [int(x) for x in r["centroid"]]))
    for b in books:
        b.sort()
    return books


def _books_literal(books: list[list[tuple[int, list[int]]]]) -> Column:
    """ONE nested literal — books[m] as array<struct<cnorm, code,
    centroid>> — referenced by runtime `transform` loops. Unrolling
    the n_sub x n_codes dot products into separate expressions (the
    first version) made a ~130x wider Catalyst tree whose analysis +
    codegen time dominated small-corpus runs; a single literal plus
    lambda iteration keeps the plan O(1) expressions regardless of
    codebook size, with identical semantics.

    Built as ONE server-parsed expr string (the kmeans_assign
    discipline): the per-entry Column-API form issued ~n_sub x
    n_codes x 3 py4j round trips PER QUERY BUILD, which dominated the
    serving path's per-run cost (plans are rebuilt every run; guide
    §7.3 — plan construction is driver-side, single-threaded work)."""
    parts = []
    for book in books:
        entries = []
        for j, v in book:
            cnorm = sum(int(x) * int(x) for x in v)
            arr = ",".join(str(int(x)) for x in v)
            entries.append(
                f"named_struct('cnorm',CAST({cnorm} AS BIGINT),"
                f"'code',{int(j)},"
                f"'centroid',CAST(array({arr}) AS ARRAY<BIGINT>))"
            )
        parts.append("array(" + ",".join(entries) + ")")
    return F.expr("array(" + ",".join(parts) + ")")


def pq_encode(
    corpus: DataFrame,
    books: list[list[tuple[int, list[int]]]],
    sub_dim: int = SUB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
    quantized: bool = False,
) -> DataFrame:
    """(id, codes, *carry_cols): each vector compressed to n_sub
    small ints — MAP-ONLY (books fold to one literal), the pass you'd
    persist as the PQ index. codes[m] = argmin over books[m] of the
    exact integer cost ||c||^2 - 2 sv.c with ties to the lowest code
    (array_min over (cost, code) structs — same tie-break as
    similarity.kmeans_assign). `bind` pins each subvector slice so
    Catalyst evaluates it once per subspace, not once per centroid.
    `carry_cols` ride along unchanged (e.g. the IVF cell for an
    IVF+PQ index)."""
    q = corpus.select(
        F.col(id_col).alias("vid"),
        (F.col(vec_col) if quantized else quantize(F.col(vec_col))).alias("qv"),
        *[F.col(c) for c in carry_cols],
    )
    bl = _books_literal(books)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(len(books) - 1)),
        lambda m: bind(
            F.slice(F.col("qv"), m * sub_dim + 1, sub_dim),
            lambda sv: F.array_min(
                F.transform(
                    F.element_at(bl, m + 1),
                    lambda s: F.struct(
                        (s["cnorm"] - 2 * int_dot(sv, s["centroid"])).alias("cost"),
                        s["code"].alias("code"),
                    ),
                )
            )["code"],
        ),
    )
    return q.select("vid", codes.alias("codes"), *[F.col(c) for c in carry_cols])


def _lut(
    qv: Column,
    books: list[list[tuple[int, list[int]]]],
    sub_dim: int,
    n_codes: int = N_CODES,
) -> Column:
    """Per-query ADC lookup table: lut[m][j+1] = dot(q_slice_m,
    centroid[m][j]), positionally indexed 0..n_codes-1 (codebook
    entries that lost every member during init fill 0 — no corpus row
    carries their code, so the value is never read). Densified
    per-subspace tables (code -> value at position code+1) make the
    hot-path lookup a positional element_at; built with runtime
    transforms over one nested literal (see _books_literal)."""
    dense: list[list[list[int] | None]] = []
    for book in books:
        by_code = dict(book)
        dense.append([by_code.get(j) for j in range(n_codes)])
    # one server-parsed expr string, not n_sub x n_codes F.lit calls:
    # the literal table is rebuilt on every query run, and the
    # Column-API form spent seconds per build in py4j round trips
    tables = []
    for table in dense:
        arrs = []
        for v in table:
            vals = [0] * sub_dim if v is None else [int(x) for x in v]
            arrs.append(
                "CAST(array(" + ",".join(str(x) for x in vals) + ") AS ARRAY<BIGINT>)"
            )
        tables.append("array(" + ",".join(arrs) + ")")
    dl = F.expr("array(" + ",".join(tables) + ")")
    return F.transform(
        F.sequence(F.lit(0), F.lit(len(books) - 1)),
        lambda m: bind(
            F.slice(qv, m * sub_dim + 1, sub_dim),
            lambda sv: F.transform(
                F.element_at(dl, m + 1), lambda cent: int_dot(sv, cent)
            ),
        ),
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_sub: int = N_SUB,
    n_codes: int = N_CODES,
    sub_dim: int = SUB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    books: list[list[tuple[int, list[int]]]] | None = None,
) -> DataFrame:
    """Approximate top-k by PQ/ADC: train codebooks (or reuse
    `books`/`codes`), encode the corpus, precompute each query's
    lookup table in-engine, then score candidates with n_sub lookups
    + adds per pair and take the partial top-k.

    100 TB shape: the corpus is scanned for codes once (then the
    8-byte codes frame is what moves — 64x smaller than the vectors);
    queries + their LUTs broadcast; the only exchanges are the
    codebook training agg and grouped_topk's bounded merge. ADC makes
    per-pair cost O(n_sub), independent of vector dimension."""
    if books is None:
        books = pq_codebooks(corpus, n_sub, n_codes, sub_dim, id_col, vec_col)
    if codes is None:
        codes = pq_encode(corpus, books, sub_dim, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("q_vec")
    ).select("query_id", _lut(F.col("q_vec"), books, sub_dim, n_codes).alias("lut"))
    scored = (
        codes.withColumnRenamed("vid", "neighbor_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("lut"),
                    F.col("codes"),
                    lambda l, c: F.element_at(l, c + 1),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("approx_dot"),
        )
    )
    from corrie_spark.operators.similarity import grouped_topk

    return grouped_topk(scored, k, order_col="approx_dot")


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    n_sub: int = N_SUB,
    n_codes: int = N_CODES,
    sub_dim: int = SUB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    books: list[list[tuple[int, list[int]]]] | None = None,
    codes: DataFrame | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF + PQ (the FAISS-style inverted-file layout): rank coarse
    cells by dot(query, cell centroid), then ADC-score ONLY the PQ
    codes inside the top-`nprobe` cells.

    This composes the two scale levers: IVF cuts the candidate set to
    ~nprobe/#cells of the corpus, PQ makes each surviving candidate
    cost n_sub lookups against an 8-byte code instead of a
    full-dimension dot against a 512-byte vector. The index that
    moves is (cell, codes) — neither vectors nor raw floats. Codes
    are plain PQ over the full vectors (not residual-encoded; the
    residual refinement is a quality add-on, the data layout and
    plan shape are identical).

    Plan: centroid table broadcast for probe selection (Q x #cells
    window — query-side only, metadata-sized); probed (query, cell,
    LUT) broadcast against the codes frame as a CELL EQUI-JOIN (never
    a crossJoin over the corpus); partial top-k merge. The corpus-side
    frame is never shuffled."""
    from pyspark.sql.window import Window

    from corrie_spark.operators.similarity import grouped_topk, ivf_centroids

    if books is None:
        books = pq_codebooks(corpus, n_sub, n_codes, sub_dim, id_col, vec_col)
    if codes is None:
        codes = pq_encode(
            corpus, books, sub_dim, id_col, vec_col, carry_cols=(cell_col,)
        )
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
        .select(
            "query_id",
            F.col("cell").alias("probe_cell"),
            _lut(F.col("q_vec"), books, sub_dim, n_codes).alias("lut"),
        )
    )
    scored = (
        codes.withColumnRenamed("vid", "neighbor_id")
        .join(F.broadcast(probed), F.col(cell_col).cast("bigint") == F.col("probe_cell"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("lut"),
                    F.col("codes"),
                    lambda l, c: F.element_at(l, c + 1),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("approx_dot"),
        )
    )
    return grouped_topk(scored, k, order_col="approx_dot")


def residual_frame(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """(vid, rv, cell): each vector's exact-integer RESIDUAL from its
    coarse-cell centroid — the quantity real IVF-PQ encodes (residual
    norms are much smaller than vector norms, so a fixed codebook
    budget spends its resolution where the information is). Broadcast
    centroid join + one zip_with: map-only against the corpus scan."""
    base = corpus.select(
        F.col(id_col).alias("vid"),
        quantize(F.col(vec_col)).alias("qv"),
        F.col(cell_col).cast("bigint").alias("cell"),
    )
    return base.join(F.broadcast(cents), "cell").select(
        "vid",
        F.zip_with(F.col("qv"), F.col("centroid"), lambda a, b: a - b).alias("rv"),
        "cell",
    )


def ivfpq_residual_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    n_sub: int = N_SUB,
    n_codes: int = N_CODES,
    sub_dim: int = SUB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    books: list[list[tuple[int, list[int]]]] | None = None,
    codes: DataFrame | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF + RESIDUAL PQ — the faithful FAISS IVFPQ layout: codebooks
    are trained on (vector - cell centroid) residuals, and the ADC
    score decomposes exactly as

        dot(q, x) ~ dot(q, c_cell)  +  sum_m lut[m][code_m(x)]

    where the first term is the probe-time cell dot (already computed
    to RANK the cells — reused for free) and the lookup tables are
    raw-query-subvector dots against the RESIDUAL codebooks. Same
    index size (8 bytes/vector), same plan shape as ivfpq_topk
    (broadcast centroids for probing, cell equi-join against the
    codes frame, partial top-k); the residual encoding only changes
    WHAT the codebooks approximate, which is why its recall >= plain
    IVFPQ's is pinned by test rather than assumed."""
    from pyspark.sql.window import Window

    from corrie_spark.operators.similarity import grouped_topk, ivf_centroids

    if cents is None:
        cents = ivf_centroids(corpus, cell_col, vec_col, dim)
    if books is None or codes is None:
        res = residual_frame(corpus, cents, id_col, vec_col, cell_col)
        books = pq_codebooks(res, n_sub, n_codes, sub_dim, "vid", "rv", quantized=True)
        codes = pq_encode(
            res, books, sub_dim, "vid", "rv", carry_cols=("cell",), quantized=True
        )
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
        .select(
            "query_id",
            F.col("cell").alias("probe_cell"),
            "cell_dot",
            _lut(F.col("q_vec"), books, sub_dim, n_codes).alias("lut"),
        )
    )
    scored = (
        codes.withColumnRenamed("vid", "neighbor_id")
        .join(F.broadcast(probed), F.col("cell") == F.col("probe_cell"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("cell_dot")
                + F.aggregate(
                    F.zip_with(
                        F.col("lut"),
                        F.col("codes"),
                        lambda l, c: F.element_at(l, c + 1),
                    ),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                )
            ).alias("approx_dot"),
        )
    )
    return grouped_topk(scored, k, order_col="approx_dot")


def ivfpq_refined_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    refine_factor: int = 4,
    nprobe: int = 2,
    n_sub: int = N_SUB,
    n_codes: int = N_CODES,
    sub_dim: int = SUB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    books: list[list[tuple[int, list[int]]]] | None = None,
    codes: DataFrame | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ + REFINE — the standard FAISS `RefineFlat` layer this
    index family was missing: take the top `k * refine_factor` ADC
    candidates from the residual IVF-PQ stage, fetch their RAW
    (quantized) vectors by an id-keyed join, re-rank by the EXACT
    integer dot, and keep the top k. ADC error can only reorder or
    drop candidates; re-ranking a wider beam with exact dots recovers
    every true neighbor the beam retained, so recall@k is >= the
    unrefined stage's at the cost of Q x k x refine_factor exact dots
    (pinned by tests/test_pq.py).

    100 TB shape: the candidate frame is Q x (k * refine_factor) rows
    of (query_id, neighbor_id) longs — broadcast-sized for any
    interactive Q — so the vector fetch is a BROADCAST equi-join
    against the corpus scan (corpus never shuffles; at extreme Q the
    same join shuffles on the id key instead). Exact re-rank cost is
    one int_dot per candidate, independent of corpus size."""
    cand = ivfpq_residual_topk(
        queries,
        corpus,
        k=k * refine_factor,
        nprobe=nprobe,
        n_sub=n_sub,
        n_codes=n_codes,
        sub_dim=sub_dim,
        id_col=id_col,
        vec_col=vec_col,
        cell_col=cell_col,
        dim=dim,
        books=books,
        codes=codes,
        cents=cents,
    ).select("query_id", "neighbor_id")
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("n_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("q_vec")
    )
    # attach the query vectors to the candidate list BEFORE the
    # broadcast (tiny x tiny join): the corpus-side fetch then builds
    # ONE broadcast relation instead of two (round-15; each broadcast
    # build is its own job, and the corpus stage probes one hash
    # relation instead of two)
    cand_q = cand.join(q, "query_id")
    scored = raw.join(F.broadcast(cand_q), "neighbor_id").select(
        "query_id",
        "neighbor_id",
        int_dot(F.col("q_vec"), F.col("n_vec")).alias("dot"),
    )
    from corrie_spark.operators.similarity import grouped_topk

    return grouped_topk(scored, k, order_col="dot")


# --- SQ8 scalar quantization ----------------------------------------------

DIM = 64


def sq8_bounds(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, int]]:
    """Per-dimension (min, max) of the quantized integer vectors — the
    whole SQ8 "codebook". One posexplode + narrow (d -> min/max) agg
    over the corpus; the driver holds dim pairs of ints
    (metadata-sized at any corpus scale, like centroids/codebooks)."""
    rows = (
        corpus.select(F.posexplode(quantize(F.col(vec_col))).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    by_dim = {r["d"]: (r["lo"], r["hi"]) for r in rows}
    return [by_dim[d] for d in range(len(by_dim))]


def _sq8_arrays(bounds: list[tuple[int, int]]) -> tuple[str, str]:
    """(mins, spans) as SQL array literals (one F.expr string per
    frame keeps the driver py4j-cheap and the plan textually small)."""
    mins = ",".join(str(lo) for lo, _ in bounds)
    spans = ",".join(str(hi - lo) for lo, hi in bounds)
    return f"array({mins})", f"array({spans})"


def sq8_encode(
    corpus: DataFrame,
    bounds: list[tuple[int, int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as dim uint8 codes:
    code_d = ((x_d - min_d) * 255) div max(span_d, 1)  in [0, 255].

    Map-only (bounds are literals in the expression — no join, no
    shuffle); the codes frame is the index you persist: 1 byte of
    information per dimension vs 8 bytes of raw float64, and ADC
    reconstruction never touches the raw vectors."""
    mins, spans = _sq8_arrays(bounds)
    code = (
        f"transform(qv, (x, d) -> ((x - element_at({mins}, d+1)) * 255)"
        f" div greatest(element_at({spans}, d+1), 1L))"
    )
    return corpus.select(
        F.col(id_col).alias("vid"), quantize(F.col(vec_col)).alias("qv")
    ).select("vid", F.expr(code).alias("codes"))


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bounds: list[tuple[int, int]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by SQ8/ADC: score = <q, recon(codes)> with
    recon_d = min_d + ((2*code_d + 1) * span_d) div 512 (the midpoint
    of the code's cell, all exact BIGINT so the oracle replays it).

    100 TB shape: codes frame scanned once (8x smaller than raw),
    queries broadcast, partial top-k bounds the only exchange. Same
    plan skeleton as pq_topk; the tradeoff axis differs — SQ8 keeps
    per-dimension resolution (better recall) at 8x compression where
    PQ buys 64x compression with coarser geometry."""
    if bounds is None:
        bounds = sq8_bounds(corpus, id_col, vec_col)
    if codes is None:
        codes = sq8_encode(corpus, bounds, id_col, vec_col)
    mins, spans = _sq8_arrays(bounds)
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("q_vec")
    )
    score = (
        "aggregate(transform(codes, (c, d) -> element_at(q_vec, d+1) *"
        f" (element_at({mins}, d+1) + ((2*c + 1) * element_at({spans}, d+1)) div 512L)),"
        " 0L, (acc, x) -> acc + x)"
    )
    scored = (
        codes.withColumnRenamed("vid", "neighbor_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(score).alias("approx_dot"))
    )
    from corrie_spark.operators.similarity import grouped_topk

    return grouped_topk(scored, k, order_col="approx_dot")
