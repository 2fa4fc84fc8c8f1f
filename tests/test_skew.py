"""Skew mitigation: salted join correctness + partitioning effect."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators.skew import explode_salts, salted_join, skew_stats, with_salt
from corrie_spark.plans.inspect import explain_str
from corrie_spark.queries.registry import all_queries
from tests.conftest import SF_CORRECT


def test_salted_join_row_identical(spark):
    """The salt must be pure partitioning: result rows identical to
    the plain join, including duplicate fact keys."""
    fact = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0)], "k long, v double"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, name string")
    got = sorted((r.k, r.v, r.name) for r in salted_join(fact, dim, "k", 4).collect())
    want = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    assert got == want


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land in multiple salt buckets."""
    fact = spark.range(2000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    salted = with_salt(fact, num_salts=8)
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 8
    # and the dim side replicates exactly num_salts-fold
    dim = spark.createDataFrame([(7, "hot")], "k long, name string")
    assert explode_salts(dim, 8).count() == 8


def test_salted_join_plan_keys_include_salt(spark):
    """The shuffle join key must be (k, _salt) — that's the whole
    mechanism; if the salt falls out of the key the hot key still
    pins one partition."""
    df = all_queries()["q_salted_join"](spark, SF_CORRECT)
    s = explain_str(df)
    assert "_salt" in s


def test_skew_stats_shares(spark):
    df = spark.createDataFrame(
        [(1,)] * 8 + [(2,)] * 2, "k long"
    )
    rows = skew_stats(df, "k", top=2).collect()
    assert rows[0].key == 1 and abs(rows[0].share - 0.8) < 1e-12
    assert rows[1].key == 2 and abs(rows[1].share - 0.2) < 1e-12


def test_connected_components_known_graph(spark):
    """Chain, triangle, and singleton: every node labels to the min id
    of its component; chain convergence needs multiple propagation
    rounds (diameter > 1)."""
    from corrie_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "doc_id long")
    got = {r.doc_id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_chain_converges_logarithmically(spark):
    """A 200-node path has diameter 199: plain min-propagation needs
    ~199 rounds (and would blow the max_iters=50 guard); pointer
    jumping must converge in O(log n) — well under 20 — with the same
    all-nodes-label-to-min result."""
    from corrie_spark.operators.dedup import connected_components

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    labels, rounds = connected_components(edges, nodes, return_rounds=True)
    assert rounds <= 20, rounds
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_ignores_unknown_endpoints(spark):
    """Contract: edge endpoints absent from `nodes` are excluded from
    the output (the pre-fused behavior), never emitted with a NULL
    cluster_id (round-6 advice: the fused round's nbr branch would
    otherwise invent old=NULL rows for them)."""
    from corrie_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    # 99 is not a node; 1-2 is a normal edge; 3 stays singleton
    edges = spark.createDataFrame([(1, 2), (2, 99)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 3}
    assert None not in got and None not in got.values()
