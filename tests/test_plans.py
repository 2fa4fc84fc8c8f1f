"""Plan-quality tests: the 100 TB contract checked mechanically.

A query that returns correct rows but scans every column, skips
pushdown, or shuffles a fact table through a dimension join would
pass the oracle gate and still be wrong at scale — these tests pin
the physical plan shape we designed."""

from __future__ import annotations

from corrie_spark.plans import (
    count_shuffles,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)
from corrie_spark.queries.registry import all_queries
from tests.conftest import SF_CORRECT


def test_q1_pushdown_pruning_single_shuffle(spark):
    df = all_queries()["q1_pricing_summary"](spark, SF_CORRECT)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed
    # column pruning: 7 of 11 lineitem columns, never l_orderkey/partkey
    [schema] = read_schemas(df)
    assert "l_orderkey" not in schema and "l_partkey" not in schema
    assert "l_quantity" in schema
    # one shuffle: the final 6-group aggregation
    assert count_shuffles(df) == 1


def test_q3_broadcasts_customer(spark):
    df = all_queries()["q3_shipping_priority"](spark, SF_CORRECT)
    assert has_broadcast_join(df)
    pushed = " ".join(pushed_filters(df))
    # segment + date filters reach the scans
    assert "c_mktsegment" in pushed and "o_orderdate" in pushed and "l_shipdate" in pushed


def test_q5_no_dimension_shuffle(spark):
    df = all_queries()["q5_local_supplier_volume"](spark, SF_CORRECT)
    assert has_broadcast_join(df)
    # only shuffles: lineitem-orders join (2 sides) + final group agg;
    # dims must NOT add exchanges
    assert count_shuffles(df) <= 3


def test_text_ops_are_shuffle_free(spark):
    """Per-document operators must be pure map stages."""
    for name in ("q_text_stats", "q_text_quality", "q_text_langid", "q_dedup_minhash"):
        df = all_queries()[name](spark, SF_CORRECT)
        assert count_shuffles(df) == 0, name


def test_similarity_broadcasts_queries(spark):
    df = all_queries()["q_sim_cosine_topk"](spark, SF_CORRECT)
    assert has_broadcast_join(df)


def test_events_scan_prunes_columns(spark):
    df = all_queries()["q_json_props"](spark, SF_CORRECT)
    [schema] = read_schemas(df)
    assert "props" in schema and "user_id" not in schema and "value" not in schema
