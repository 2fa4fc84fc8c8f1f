"""Read-surface analytics queries (SURVEY §2.5 R1-R3 parity + beyond).

The reference's vendored driver exposes a full SELECT/streamed-read
surface (stmt.go:69-97, rows.go:42-141) incl. TOTALS/EXTREMES result
sets (rows.go:62-80); corrie itself never calls it. Here that read
surface is the Spark DataFrame/SQL API over the sink tables; TOTALS ≈
rollup, EXTREMES ≈ min/max aggregates.

Scale notes (100 TB): every query here is expressed declaratively so
Catalyst handles pushdown/pruning; dimension tables (region, nation,
customer, supplier, part) are explicitly `broadcast()` so fact-side
joins never shuffle the big table; aggregations are partial
(map-side combine) by construction of groupBy.

Determinism: double sums go through DECIMAL(18,6) (order-independent)
then back to DOUBLE; LIMIT queries carry a full deterministic ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.queries.registry import register
from corrie_spark.tables import load


def dsum(col: F.Column | str, alias: str, scale: int = 6) -> F.Column:
    """Order-independent sum of a double expr: exact decimal accumulate,
    double result. Matches `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: F.Column | str, alias: str, scale: int = 6) -> F.Column:
    """avg as exact-decimal-sum / count -> identical double division in
    Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)).alias(alias)


_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (flagship query).

    Plan shape: parquet scan with shipdate pushed down + only 7 columns
    read -> partial hash agg -> shuffle on (returnflag, linestatus)
    [~6 groups] -> final agg. Survives 100x scale: shuffle volume is
    O(partitions x groups), independent of row count.
    """
    from corrie_spark.tables import spread

    # Guide §2.5 (input skew — one small unsplittable parquet file):
    # the seven exact-decimal partial aggregates are the dominant cost
    # and run BEFORE the group exchange, i.e. on the scan's partition
    # count — a single split at bench scale. Conditional spread; no-op
    # at any real scale (the fact table arrives in thousands of
    # splits). Interleaved A/B at sf0.1: 1.14 -> 0.71 s, rows EQUAL.
    # The spread sits ABOVE the filter so the shipdate predicate still
    # pushes down to the parquet scan.
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        spread(
            li.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  CAST(o_orderdate AS DATE) AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: unshipped-order revenue, top 10.

    customer is broadcast (small dim at any SF once segment-filtered);
    orders-lineitem join shuffles on orderkey, both sides pre-filtered
    so the shuffle is a fraction of the fact table. Deterministic LIMIT
    via (revenue DESC, l_orderkey) tie-break.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation for intra-region trade.

    All four dims (region, nation, supplier, customer) broadcast; the
    only shuffle is lineitem-orders on orderkey. At 100 TB the dims are
    still MBs -> broadcast holds; AQE skew-join covers hot orderkeys.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")

    nation_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    supp_nat = supplier.join(
        F.broadcast(nation_region), supplier.s_nationkey == nation_region.n_nationkey
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == supp_nat.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


_ROLLUP_ORACLE = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("q_rollup_totals", oracle=_ROLLUP_ORACLE)
def q_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH TOTALS parity (reference rows.go:62-80 surfaces the server's
    TOTALS block as an extra result set): Spark-native rollup produces
    the same subtotal/grand-total rows inline."""
    li = load(spark, sf_dir, "lineitem")
    # round-14 (guide §2.3 — aggregate before you expand): rollup's
    # Expand tripled every fact row BEFORE the partial aggregate; the
    # base groupBy collapses 600k rows to the 6 (flag, status) groups
    # first and the rollup re-aggregates those (sums are associative —
    # decimal accumulate stays exact, values identical; A/B at sf0.1:
    # 1.0-1.35 -> 0.54-0.71 s).
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        pre.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_s").cast("double").alias("sum_qty"),
            F.sum("_n").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


_EXTREMES_ORACLE = """
SELECT
  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
  MIN(l_discount) AS min_disc, MAX(l_discount) AS max_disc,
  MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey,
  COUNT(*) AS n_rows
FROM lineitem
"""


@register("q_extremes", oracle=_EXTREMES_ORACLE)
def q_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTREMES parity (rows.go:112-131): min/max per column in one
    pass. Min/max of doubles is order-independent, no decimal needed.
    Parquet footer stats make this near-free (aggregate pushdown)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_TOPN_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) t
WHERE rnk <= 3
"""


@register("q_top_orders_per_customer", oracle=_TOPN_ORACLE)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-N per key. Single shuffle on o_custkey; rank
    tie-broken by o_orderkey for determinism."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


_PIVOT_ORACLE = """
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS total_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS total_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS total_p,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register("q_status_pivot", oracle=_PIVOT_ORACLE)
def q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (one shuffle, no pivot-specific
    second pass; preferable to df.pivot at scale since the column set
    is known)."""
    orders = load(spark, sf_dir, "orders")

    def status_sum(status: str, alias: str) -> F.Column:
        return (
            F.sum(
                F.when(
                    F.col("o_orderstatus") == status,
                    F.col("o_totalprice").cast("decimal(18,6)"),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            )
            .cast("double")
            .alias(alias)
        )

    return orders.groupBy("o_orderpriority").agg(
        status_sum("F", "total_f"),
        status_sum("O", "total_o"),
        status_sum("P", "total_p"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_EVENTS_HOURLY_ORACLE = """
SELECT
  strftime(ts, '%Y-%m-%d %H') AS hour,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY strftime(ts, '%Y-%m-%d %H'), event_type
"""


@register("q_events_hourly", oracle=_EVENTS_HOURLY_ORACLE)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event aggregation — the batch analog of the streaming
    windowed agg in corrie_spark.streaming. Hour rendered as string so
    Spark/DuckDB timestamp types can't diverge."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "sum_value"),
        )
    )


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
)
SELECT user_id,
       CAST(SUM(is_new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged
GROUP BY user_id
"""


@register("q_sessionize", oracle=_SESSION_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity). One shuffle on
    user_id shared by the window and the groupBy (Catalyst reuses the
    partitioning). Streaming twin: session window in streaming module."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    return (
        ev.withColumn(
            "is_new_session",
            F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
        )
        .groupBy("user_id")
        .agg(
            F.sum("is_new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_PROPS_ORACLE = """
SELECT
  event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


@register("q_json_props", oracle=_PROPS_ORACLE)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props column -> typed agg
    (reference envelope is JSON too; this is the generic read-side
    JSON path, M1 analog on stored data)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
    )


_SET_OPS_ORACLE = """
WITH big_spenders AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
),
urgent_buyers AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
both_sets AS (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM urgent_buyers),
only_big AS (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM urgent_buyers)
SELECT 'intersect' AS set_op, COUNT(*) AS n_customers,
       COALESCE(MIN(custkey), -1) AS min_custkey FROM both_sets
UNION ALL
SELECT 'except' AS set_op, COUNT(*) AS n_customers,
       COALESCE(MIN(custkey), -1) AS min_custkey FROM only_big
"""


@register("q_set_ops", oracle=_SET_OPS_ORACLE)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT) over customer key sets.

    Plan shape: both inputs pre-distinct and reduced to the key column
    before the set op, so the shuffles carry keys only; INTERSECT and
    EXCEPT plan as semi/anti joins respectively under the hood —
    bounded output, no row duplication.
    """
    orders = load(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()

    def summarize(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.coalesce(F.min("custkey"), F.lit(-1)).alias("min_custkey"),
        ).select(F.lit(label).alias("set_op"), "n_customers", "min_custkey")

    return summarize(big.intersect(urgent), "intersect").unionByName(
        summarize(big.subtract(urgent), "except")
    )


_CUBE_ORACLE = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register("q_cube_status_priority", oracle=_CUBE_ORACLE)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority): all 4 grouping sets in one
    pass — the OLAP cross-tab the reference's TOTALS surface only
    approximates. Grouping-set expansion happens before the exchange,
    so it's still a single shuffle."""
    orders = load(spark, sf_dir, "orders")
    # round-14 (guide §2.3): pre-aggregate to the 15 (status, priority)
    # groups before the cube so Expand quadruples 15 rows, not 150k
    # (sums associative, values identical — the q_rollup_totals trick).
    pre = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("_s"),
    )
    return (
        pre.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("_n").alias("n_orders"),
            F.sum("_s").cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


_RANKS_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, total_spend,
  RANK()         OVER w AS rnk,
  DENSE_RANK()   OVER w AS dense_rnk,
  NTILE(4)       OVER w AS quartile,
  CUME_DIST()    OVER w AS cume,
  PERCENT_RANK() OVER w AS pct_rank
FROM spend
WINDOW w AS (ORDER BY total_spend DESC, o_custkey)
"""


@register("q_customer_spend_ranks", oracle=_RANKS_ORACLE)
def q_customer_spend_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over per-customer spend:
    rank / dense_rank / ntile / cume_dist / percent_rank in one
    window. Single global sort — fine for a post-aggregation result
    bounded by |customers|; never run an unpartitioned window over a
    raw fact table."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "total_spend"))
    w = Window.orderBy(F.col("total_spend").desc(), "o_custkey")
    return spend.select(
        "o_custkey",
        "total_spend",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


_Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05e0 AND 0.07e0
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + scalar aggregate — the pushdown
    stress test. All three predicates reach the parquet scan
    (PushedFilters); zero joins, one single-partition exchange for the
    final row. At 100 TB this is bounded by scan bandwidth alone."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  c_acctbal,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: customers who returned the most revenue in a
    half-year window. Returnflag filter pushed to the lineitem scan,
    date range to orders; customer+nation broadcast; the orderkey
    join is the one real shuffle. Top-20 via TakeOrdered."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust_nat = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_GSETS_ORACLE = """
SELECT
  COALESCE(o_orderstatus, '-') AS status,
  COALESCE(c_mktsegment, '-') AS segment,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY GROUPING SETS ((o_orderstatus, c_mktsegment), (o_orderstatus), (c_mktsegment))
"""


@register("q_grouping_sets", oracle=_GSETS_ORACLE)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form CUBE/ROLLUP
    specialize: (status x segment), (status), (segment) in ONE pass
    with GROUPING() disambiguating real NULLs from subtotal rows.
    Spark expands grouping sets before the exchange, so this is the
    broadcast customer join plus a single shuffle, not three queries
    over the fact table."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    gid = (F.grouping("o_orderstatus") * 2 + F.grouping("c_mktsegment")).cast("long")
    # round-14 (guide §2.3): pre-aggregate to the (status, segment)
    # groups before the grouping-set Expand (sums associative, values
    # identical; GROUPING() still disambiguates on the outer level).
    pre = joined.groupBy("o_orderstatus", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("_s"),
    )
    return (
        pre.groupingSets(
            [["o_orderstatus", "c_mktsegment"], ["o_orderstatus"], ["c_mktsegment"]],
            "o_orderstatus",
            "c_mktsegment",
        )
        .agg(
            gid.alias("gid"),
            F.sum("_n").alias("n_orders"),
            F.sum("_s").cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("-")).alias("status"),
            F.coalesce("c_mktsegment", F.lit("-")).alias("segment"),
            "gid",
            "n_orders",
            "total_price",
        )
    )
