"""Storage-layout scale contracts: partition pruning is visible in the
plan and bucketed joins run with zero exchanges."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from corrie_spark.plans.inspect import count_shuffles, explain_str
from corrie_spark.sinks.layout import read_partitioned, write_bucketed, write_time_partitioned
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


def test_time_partition_pruning(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path, granularity="day")

    df = read_partitioned(spark, path).filter(F.col("p_date") == "2024-01-15")
    s = explain_str(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", s)
    assert m and "p_date" in m.group(1), s
    # pruning is semantic too: only that day's rows come back
    want = ev.filter(F.to_date("ts") == "2024-01-15").count()
    assert df.count() == want and want > 0


def test_month_partition_layout(spark, tmp_path):
    ev = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_month")
    write_time_partitioned(ev, path, granularity="month")
    df = read_partitioned(spark, path)
    assert {"p_year", "p_month"} <= set(df.columns)
    assert df.count() == ev.count()


def test_bucketed_join_zero_shuffle(spark, tmp_path):
    """The amortized-shuffle contract: orders and lineitem bucketed on
    the join key -> the join plan has NO shuffle exchange at all."""
    orders = load(spark, SF_SMOKE, "orders")
    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 4, path=str(tmp_path / "ob"))
    write_bucketed(li, "t_lineitem_b", "l_orderkey", 4, path=str(tmp_path / "lb"))
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        assert count_shuffles(joined) == 0, explain_str(joined)
        # correctness unchanged by layout
        want = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
