"""SemDeDup operator: within-cell blocking, keep-min-id policy, plan
shape (equi-join on cell, never a cartesian product; norms map-side).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import similarity as S


def _cells(spark, rows):
    # (vid, qv, cell) — quantized-integer vectors as kmeans_cells emits
    return spark.createDataFrame(rows, "vid long, qv array<bigint>, cell bigint")


def test_pairs_only_within_cell(spark):
    # identical vectors in DIFFERENT cells must not pair
    rows = [
        (1, [100, 0], 0),
        (2, [100, 0], 1),
        (3, [100, 1], 0),
    ]
    pairs = S.semdedup_pairs(_cells(spark, rows), threshold=0.9).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 3)]


def test_threshold_and_exact_dot(spark):
    rows = [
        (1, [3, 4], 0),  # norm 25
        (2, [4, 3], 0),  # dot 24, cos 24/25 = 0.96
        (3, [-3, -4], 0),  # cos -1 vs vid 1
    ]
    pairs = S.semdedup_pairs(_cells(spark, rows), threshold=0.95).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.id_a, p.id_b, p.dot) == (1, 2, 24)
    assert p.cos == 24 / 25


def test_cell_report_keep_min_id(spark):
    # cell 0: 1~2~3 all mutually close -> drop 2 and 3, keep 1
    # cell 1: 4 alone -> kept
    rows = [
        (1, [10, 0], 0),
        (2, [10, 1], 0),
        (3, [11, 0], 0),
        (4, [10, 0], 1),
    ]
    rep = {r.cell: r for r in S.semdedup_cell_report(_cells(spark, rows), 0.9).collect()}
    assert (rep[0].n_vectors, rep[0].n_dropped, rep[0].n_kept) == (3, 2, 1)
    assert (rep[1].n_vectors, rep[1].n_dropped, rep[1].n_kept) == (1, 0, 1)


def test_plan_one_shuffle_gram_stage_no_join(spark):
    """The pair stage is ONE hash-partition exchange on the cell key
    feeding an Arrow Gram stage — no self-join, never a cartesian:
    only input vectors and above-threshold hits cross the wire."""
    rows = [(i, [i, 1], i % 2) for i in range(1, 9)]
    df = S.semdedup_pairs(_cells(spark, rows), threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Join" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(cell" in plan


def test_chunked_matmul_equals_unchunked(spark):
    """The row-chunked Gram path (memory bound: block_rows x |cell|)
    must emit exactly the same pairs as one whole-cell matmul —
    including pairs that straddle a chunk boundary."""
    rows = [(i, [i % 7 + 1, (3 * i) % 5 + 1, i % 3], i % 2) for i in range(1, 40)]
    whole = sorted(
        map(tuple, S.semdedup_pairs(_cells(spark, rows), 0.8, block_rows=4096).collect())
    )
    chunked = sorted(
        map(tuple, S.semdedup_pairs(_cells(spark, rows), 0.8, block_rows=3).collect())
    )
    assert whole == chunked
    assert len(whole) > 5  # non-trivial corpus actually produced hits
