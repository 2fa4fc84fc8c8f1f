"""Graph analytics over near-duplicate pair graphs: PageRank.

Connected components (operators/dedup.connected_components) answers
"which documents are the same"; PageRank answers "which document is
the CENTER of its duplicate neighborhood" — the canonical-
representative / hub-selection signal a corpus build uses when
keep-min-id is too arbitrary (keep the most-linked variant of a
boilerplate family instead of the lowest crawl id).

EXACT INTEGER power iteration. Float PageRank is not reproducible
across engines or partitionings (per-node contribution sums are
float-order-dependent); here ranks are BIGINTs scaled by 10^12 and
every step is integer arithmetic:

    contrib(u)   = r(u) div deg(u)              (truncating div)
    s(v)         = sum of contribs of v's in-neighbors  (exact)
    r'(v)        = (SCALE * (100-d)) div (100 * N) + (d * s(v)) div 100

with d the damping percentage (85 = the classic 0.85). Truncation
loses mass (ranks sum to slightly under SCALE) but identically in
every engine — the DuckDB oracle unrolls the same rounds with `//`
and matches bit-for-bit. |r| <= SCALE=10^12 and d*s <= 85*10^12 stay
far inside int64.

Scale shape per round: one co-partitioned join ranks->edges on the
source id plus one groupBy(dst) with map-side partial sums — two
key-width shuffles, no all-pairs anything; localCheckpoint per round
keeps the plan flat (the CC loop's discipline); the driver never sees
row data. Rounds are a fixed small constant (power iteration
converges geometrically; rank ORDER stabilizes long before values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    n_iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank_scaled) after `n_iters` exact-integer power
    iterations over the UNDIRECTED pair graph (each (id_a, id_b) edge
    contributes in both directions). Nodes without edges hold the
    teleport base rank. rank_scaled is the 10^12-scaled BIGINT — keep
    it integral for engine-exact comparison; divide by 1e12 for the
    conventional value."""
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.count()  # scalar, metadata-sized
    base = (SCALE * (100 - damping_pct)) // (100 * n_nodes)
    ranks = nodes.select(
        F.col(id_col).alias("node"), F.lit(SCALE // n_nodes).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    # degree is loop-invariant: checkpoint once, reuse every round
    sym_deg = sym.join(deg, "src").localCheckpoint(eager=True)
    for _ in range(n_iters):
        contrib = (
            sym_deg.join(ranks, sym_deg.src == ranks.node)
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.select("node")
            .join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def count_triangles(pairs: DataFrame) -> DataFrame:
    """Exact triangle census of an undirected pair graph, returned as
    one row: (n_nodes, n_edges, n_triangles, max_degree).

    Algorithm: degree-ordered wedge closure — orient every edge from
    its lower-(degree, id) endpoint to the higher one, build wedges at
    the common SOURCE of two oriented edges, and close each wedge with
    one semi-join back into the oriented edge set. Every triangle is
    counted exactly once (its unique degree-min vertex roots the
    wedge).

    Why orientation matters at 100 TB: wedge count at a node is
    quadratic in its ORIENTED out-degree, and orienting toward higher
    degree caps out-degree at O(sqrt(|E|)) — the classic bound that
    tames power-law hubs (a 10^6-degree boilerplate hub would
    otherwise build 10^12 wedges; oriented, its wedges land on its
    low-degree neighbors instead). The oracle counts the same
    triangles with a naive 3-way join — same number, feasible only at
    oracle scale.

    Plan: degrees = one groupBy; orientation = broadcast-free
    projection after a degree join; wedges = one self-join on src;
    closure = one semi-join on the (lo, hi) edge key. All equi-joins
    on long keys.
    """
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))

    du = deg.select(F.col("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v"))
    keyed = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            # orient from lower (deg, id) to higher (deg, id)
            (
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v")))
            ).alias("fwd"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("fwd"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("fwd"), F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    w1 = oriented.select(F.col("src"), F.col("dst").alias("x"))
    w2 = oriented.select(F.col("src"), F.col("dst").alias("y"))
    wedges = w1.join(w2, "src").filter(F.col("x") < F.col("y"))
    # closing-edge lookup: the input pairs are already (min, max)
    # normalized, so the canonical key set IS the pair list
    closing = e.select(F.col("u").alias("x2"), F.col("v").alias("y2"))
    tri = wedges.join(
        closing,
        (F.least("x", "y") == F.col("x2")) & (F.greatest("x", "y") == F.col("y2")),
        "left_semi",
    )
    return (
        tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .crossJoin(deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                           F.max("deg").cast("bigint").alias("max_degree")))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
        .select("n_nodes", "n_edges", "n_triangles", "max_degree")
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 8,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """k-core of an undirected pair graph: iteratively peel nodes of
    degree < k until fixpoint; return the surviving nodes with their
    in-core degree. On a near-dup pair graph the 2-core separates
    mutually-confirming duplicate families (every member tied to >= 2
    others) from chain/pendant pairs — the LSH-noise-shaped part of
    the graph.

    Peeling runs a FIXED `rounds` count (extra rounds after the
    fixpoint are no-ops, so any rounds >= the true peel depth gives
    the same answer — which is what lets an engine-independent oracle
    replay it), then VERIFIES convergence and raises if the graph
    needed more (the raise-on-nonconvergence discipline of
    connected_components). Each round: one degree agg + two
    key-equi semi joins, lineage cut per round (localCheckpoint, the
    CC tradeoff — edge lists are |pairs|-sized, tiny vs the corpus).
    """
    und = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionAll(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    for _ in range(rounds):
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        keep = deg.filter(F.col("c") >= k).select("src")
        und = (
            und.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    final_deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    low = final_deg.agg(F.min("c").alias("m")).collect()[0]["m"]
    if low is not None and low < k:
        raise RuntimeError(
            f"kcore: not converged after {rounds} rounds (min degree {low} < {k}); "
            "raise `rounds`"
        )
    return final_deg.select(
        F.col("src").alias("node"), F.col("c").alias("core_degree")
    )
