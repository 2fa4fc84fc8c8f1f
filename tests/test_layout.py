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


def test_morton_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from corrie_spark.sinks.layout import morton_key

    df = spark.range(1).select(
        morton_key(F.lit(0b1010), F.lit(0b0110), bits=4).alias("z")
    )
    # c1 bits at even positions, c2 bits at odd: 1010 x 0110 ->
    # z = sum(c1_i << 2i) + sum(c2_i << (2i+1)) = 0b01101100
    assert df.collect()[0].z == 0b01101100


def test_zorder_tightens_rowgroup_stats_on_both_columns(spark, tmp_path):
    """The data-skipping proof, read straight from parquet footers:
    Z-ordered files have small min/max spans on BOTH columns, while a
    single-column sort leaves the second column's span ~ full domain
    (so no filter on it can skip row groups)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from corrie_spark.sinks.layout import write_zordered

    n, dom = 20000, 1 << 10
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % dom).alias("x"),
        (F.col("id") * 40503 % dom).alias("y"),
    )

    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, "x", "y", bits=10, files=8)
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(spath)

    def spans(path, col):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(sch[col]).statistics
                out.append(st.max - st.min)
        return sum(out) / len(out)

    # plain x-sort: x spans tight, y spans ~ full domain
    assert spans(spath, "x") < dom / 4
    assert spans(spath, "y") > dom * 0.8
    # z-order: BOTH columns' spans are a fraction of the domain
    assert spans(zpath, "x") < dom * 0.6
    assert spans(zpath, "y") < dom * 0.6
    # and the y-span improvement vs the plain sort is large
    assert spans(zpath, "y") < spans(spath, "y") / 1.5


def test_dynamic_partition_pruning_engages(spark, tmp_path):
    """Joining a day-partitioned fact against a selectively-filtered
    dim must plan a dynamicpruning subquery on the fact scan — at
    100 TB this is the difference between scanning one day and
    scanning the table when the qualifying days are only known at
    runtime (the star-join backfill shape)."""
    from pyspark.sql import functions as F

    from corrie_spark.tables import load
    from tests.conftest import SF_SMOKE

    ev = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev_days")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(path)

    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(f"2024-01-{i:02d}", f"t{i}") for i in range(1, 10)],
        "day string, tag string",
    )
    j = fact.join(dim.filter(F.col("tag") == "t2"), "day").agg(F.count("*"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_morton_key_is_bijective(spark):
    """Round-trip property: de-interleaving the key recovers exactly
    (x, y) for a grid sample — no collisions, no dropped bits."""
    from pyspark.sql import functions as F

    from corrie_spark.sinks.layout import morton_key

    def demorton(z, bits=8):
        x = y = 0
        for i in range(bits):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    df = (
        spark.range(256)
        .select((F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y"))
        .select("x", "y", morton_key(F.col("x"), F.col("y"), bits=8).alias("z"))
    )
    rows = df.collect()
    assert len({r.z for r in rows}) == 256  # injective on the grid
    for r in rows:
        assert demorton(r.z) == (r.x, r.y)
