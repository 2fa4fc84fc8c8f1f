"""Integer-exact PageRank: structural properties on known graphs,
determinism, and the flat (checkpointed) per-round plan."""

from __future__ import annotations

from corrie_spark.operators.graph import SCALE, pagerank


def _pr(spark, edges, nodes, **kw):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    return {r["node"]: r["rank_scaled"] for r in pagerank(e, n, **kw).collect()}


def test_star_center_ranks_highest(spark):
    """Hub selection: the center of a star out-ranks every leaf (the
    'keep the most-linked variant' signal)."""
    ranks = _pr(spark, [(0, i) for i in range(1, 6)], range(6))
    assert ranks[0] == max(ranks.values())
    assert len({ranks[i] for i in range(1, 6)}) == 1  # leaves symmetric


def test_symmetric_pair_equal_and_isolated_gets_base(spark):
    ranks = _pr(spark, [(1, 2)], [1, 2, 3])
    assert ranks[1] == ranks[2]
    # an isolated node converges to the teleport base immediately
    base = (SCALE * 15) // (100 * 3)
    assert ranks[3] == base


def test_mass_roughly_conserved_never_exceeded(spark):
    """Truncating division only LOSES scaled mass: total rank stays
    <= SCALE and within a per-node-rounding bound of it."""
    nodes = list(range(10))
    edges = [(i, (i + 1) % 10) for i in range(9)] + [(0, 5), (2, 7)]
    ranks = _pr(spark, edges, nodes)
    total = sum(ranks.values())
    assert total <= SCALE
    # each div loses < 1 unit per node per round per term; 3 rounds,
    # generous bound
    assert total > SCALE - 10 * 3 * 100


def test_deterministic_across_runs_and_partitionings(spark):
    edges = [(i, j) for i in range(8) for j in range(i + 1, 8) if (i + j) % 3 == 0]
    a = _pr(spark, edges, range(8))
    e = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    n = spark.createDataFrame([(x,) for x in range(8)], "doc_id long").repartition(3)
    b = {r["node"]: r["rank_scaled"] for r in pagerank(e, n).collect()}
    assert a == b  # integer arithmetic: partitioning-independent


def test_round_plan_is_flat(spark):
    """localCheckpoint per round: the returned frame's plan depends
    only on the LAST round (join + agg), not n_iters nested
    re-executions."""
    from corrie_spark.plans import count_shuffles

    e = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    n = spark.createDataFrame([(x,) for x in (1, 2, 3)], "doc_id long")
    shallow = count_shuffles(pagerank(e, n, n_iters=1))
    deep = count_shuffles(pagerank(e, n, n_iters=4))
    assert deep == shallow  # plan size constant in iteration count


def test_triangle_count_k4_plus_pendant(spark):
    from corrie_spark.operators.graph import count_triangles

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "id_a long, id_b long",
    )
    row = count_triangles(pairs).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.max_degree) == (5, 7, 4, 4)


def test_triangle_count_matches_naive_on_random_graph(spark):
    import itertools
    import random

    from corrie_spark.operators.graph import count_triangles

    rng = random.Random(7)
    nodes = list(range(20))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)})
    naive = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if ((a, b) in edges and (b, c) in edges and (a, c) in edges)
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    assert count_triangles(pairs).collect()[0].n_triangles == naive


def test_triangle_free_graph(spark):
    from corrie_spark.operators.graph import count_triangles

    # star graph: no triangles, hub degree 4
    pairs = spark.createDataFrame([(0, i) for i in range(1, 5)], "id_a long, id_b long")
    row = count_triangles(pairs).collect()[0]
    assert (row.n_triangles, row.max_degree) == (0, 4)


def test_kcore_peels_chains_keeps_cliques(spark):
    """2-core of {4-clique} U {5-chain} U {pendant off the clique}:
    the clique survives with degree 3 each, everything else peels."""
    from corrie_spark.operators.graph import kcore

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # clique
             (10, 11), (11, 12), (12, 13), (13, 14),          # chain
             (4, 20)]                                          # pendant
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["node"], r["core_degree"]) for r in kcore(df, k=2).collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_kcore_raises_on_nonconvergence(spark):
    """A long chain needs ~len/2 peel rounds; rounds=1 must raise, not
    silently return a non-core."""
    import pytest

    from corrie_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="not converged"):
        kcore(df, k=2, rounds=1)
