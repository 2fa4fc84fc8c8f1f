"""Join-strategy analytics: semi/anti/broadcast/window-argmin/as-of.

The reference has no join operators at all (SURVEY §2.6 — "No joins");
these queries define the beyond-parity read surface a user of the sink
tables needs, each one exercising a distinct Spark join strategy the
optimizer must get right at 100 TB:

  - q_semi_join_late_orders   EXISTS       -> left-semi (no fact dup)
  - q_anti_join_quiet_customers NOT EXISTS -> left-anti + scalar agg
  - q_nation_volume           Q7-style     -> two broadcast dim chains
  - q_promo_revenue_share     Q14-style    -> broadcast + conditional agg
  - q_disjunctive_part_filter Q19-style    -> OR-of-ANDs pushed to join
  - q_big_orders              Q18-style    -> agg-filter then join back
  - q_cheapest_supplier_per_part           -> two-level agg + window argmin
  - q_asof_join_order_context              -> union+window as-of join
  - q13_order_count_distribution Q13-style -> agg-then-LEFT-join (keeps
                                              zero-order customers)
  - q15_top_supplier          Q15-style    -> scalar-max broadcast, no
                                              global window
  - q22_idle_rich_customers   Q22-style    -> scalar-avg broadcast +
                                              left-anti

Scale notes (100 TB): semi/anti joins never materialize the probe side
twice; every dim-side input is `broadcast()` so the lineitem scan joins
map-side with zero shuffle of the fact table; the as-of join is the
union+last_value(IGNORE NULLS) formulation — one shuffle on the join
key, no range-join row explosion, no skew amplification.

Determinism: double sums via DECIMAL(18,6) (see analytics.dsum);
every LIMIT carries a total ORDER BY; as-of tie-break is
(ts, side, orderkey) with NULL orderkey coalesced below all real keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corrie_spark.queries.analytics import dsum
from corrie_spark.queries.registry import register
from corrie_spark.tables import load

_SEMI_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q_semi_join_late_orders", oracle=_SEMI_ORACLE)
def q_semi_join_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders (1997) having >=1 lineitem shipped after
    the order date, counted per priority.

    Plan shape: left-semi join orders<-lineitem on orderkey with the
    non-equi shipdate>orderdate as a join residual. Semi-join keeps
    output at most |orders| (no fact-side duplication), and the
    orderdate range filter is pushed to the orders parquet scan.
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ANTI_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS num_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                          / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("q_anti_join_quiet_customers", oracle=_ANTI_ORACLE)
def q_anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers with no RECENT
    (2000+) orders — churn-risk accounts.

    Plan shape: scalar aggregate (avg positive balance) broadcast as a
    1-row cross join (stays in the plan — no driver collect), then
    left-anti join against orders o_custkey. Anti-join output is
    bounded by |customer|; orders side is reduced to its join column
    before the shuffle.
    """
    cust = load(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
             / F.count("c_acctbal")).alias("avg_bal")
        )
    )
    orders_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


_NATION_VOLUME_ORACLE = """
SELECT
  sn.n_name AS supp_nation,
  cn.n_name AS cust_nation,
  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
ORDER BY supp_nation, cust_nation, ship_year
"""


@register("q_nation_volume", oracle=_NATION_VOLUME_ORACLE)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations by year.

    Plan shape: supplier+nation and customer+nation dim chains are both
    broadcast (each pre-filtered to the two nations, so they shrink
    before broadcast); lineitem and orders join on orderkey — the only
    real shuffle. The nation-pair predicate lands on the broadcast
    hash-join build sides, so fact rows from other nations are dropped
    at the map stage.
    """
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


_PROMO_ORACLE = """
SELECT
  CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY CAST(date_trunc('month', l_shipdate) AS DATE)
ORDER BY ship_month
"""


@register("q_promo_revenue_share", oracle=_PROMO_ORACLE)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: monthly promo vs total revenue.

    Plan shape: part is broadcast (only partkey+type columns read),
    lineitem scans with the shipdate range pushed down, conditional
    aggregation is a single pass — no second join or self-union for
    the promo subset.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0), "promo_revenue"),
            dsum(rev, "total_revenue"),
        )
        .orderBy("ship_month")
    )


_DISJ_ORACLE = """
SELECT
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25)
"""


@register("q_disjunctive_part_filter", oracle=_DISJ_ORACLE)
def q_disjunctive_part_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: OR-of-ANDs predicate spanning both join sides.

    Plan shape: part is broadcast; the disjunction splits into a
    part-only pre-filter (brand IN (...) — Catalyst derives it from the
    OR) on the build side plus the mixed residual on the joined rows.
    Single aggregate output row — zero-shuffle final stage.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#11")
         & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#22")
           & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 15))
        | ((F.col("p_brand") == "Brand#33")
           & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 25))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


_BIG_ORDERS_ORACLE = """
SELECT
  c_name,
  o_orderkey,
  CAST(o_orderdate AS DATE) AS orderdate,
  o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
)
GROUP BY c_name, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q_big_orders", oracle=_BIG_ORDERS_ORACLE)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: largest-volume orders (sum qty > 150), top 20.

    Plan shape: aggregate lineitem by orderkey first (map-side partial
    combine collapses ~4 rows/key before the shuffle), HAVING filter
    shrinks the key set to a handful of orders, then join orders to
    the surviving keys (AQE broadcasts the tiny filtered side) —
    one shuffle total; customer is broadcast.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_keys = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big_keys, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_CHEAPEST_ORACLE = """
WITH per_supp AS (
  SELECT
    l_partkey,
    l_suppkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS avg_unit_price
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY l_partkey
                       ORDER BY avg_unit_price, l_suppkey) AS rn
  FROM per_supp
)
SELECT
  l_partkey AS partkey,
  l_suppkey AS best_suppkey,
  avg_unit_price
FROM ranked
WHERE rn = 1
ORDER BY partkey
LIMIT 100
"""


@register("q_cheapest_supplier_per_part", oracle=_CHEAPEST_ORACLE)
def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-flavored argmin: cheapest supplier per part by observed
    quantity-weighted unit price, SUM(price)/SUM(qty) (this schema has
    no partsupp; unit price is derived from lineitem).

    Determinism: the ratio of two EXACT decimal sums (prices have 2
    decimals, quantities are integers — both cast to DECIMAL(18,6)
    without rounding). A per-row price/qty division can land exactly
    on a 5e-7 decimal tie (e.g. qty=32), where Spark's HALF_UP and
    DuckDB's half-even double->decimal conversions disagree — found
    by the sf0.001 sweep, invisible at sf0.01.

    Plan shape: two-level aggregation — groupBy(part,supp) with partial
    combine (collapses the fact table to |part x supp| before any
    shuffle), then a window argmin partitioned by partkey; final
    ORDER BY+LIMIT folds to TakeOrderedAndProject (no global sort
    exchange). Two shuffles total, both on already-aggregated data.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # round-14 (guide §2.4 — share one exchange): hash-partitioning by
    # l_partkey up front satisfies BOTH the (part, supp) groupBy's
    # clustered distribution AND the window's partitioning, collapsing
    # the plan's two exchanges (480k aggregated pairs + window input)
    # to this single one; the partition count follows
    # spark.sql.shuffle.partitions (scale-tuned conf, not a constant).
    # Measured 1.5-2.2 s -> 0.85-1.2 s at sf0.1, rows identical.
    li = li.repartition("l_partkey")
    per_supp = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            ).alias("avg_unit_price")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("avg_unit_price", "l_suppkey")
    return (
        per_supp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("best_suppkey"),
            "avg_unit_price",
        )
        .orderBy("partkey")
        .limit(100)
    )


# As-of join: for every event, attach the most recent order (by
# o_orderdate <= event ts) of the same customer. Formulated as
# union + last_value(IGNORE NULLS) over (user, time) — the classic
# scalable as-of: one shuffle on the key, zero row explosion,
# instead of an inequality join (O(n*m) per key) that dies on skew.
# Tie-break: orders sort before events at equal ts (side 0 < 1), and
# among same-ts orders the highest orderkey wins; NULL orderkeys
# (event rows) are coalesced to -1 so both engines order identically.
_ASOF_ORACLE = """
WITH unioned AS (
  SELECT o_custkey AS user_id, o_orderdate AS ts, 0 AS side,
         o_orderkey, o_totalprice,
         NULL::BIGINT AS event_id, NULL::VARCHAR AS event_type
  FROM orders
  UNION ALL
  SELECT user_id, ts, 1 AS side,
         NULL::BIGINT AS o_orderkey, NULL::DOUBLE AS o_totalprice,
         event_id, event_type
  FROM events
),
filled AS (
  SELECT *,
    last_value(o_orderkey IGNORE NULLS) OVER w AS last_orderkey,
    last_value(o_totalprice IGNORE NULLS) OVER w AS last_totalprice
  FROM unioned
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts, side, COALESCE(o_orderkey, -1)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, event_type, last_orderkey, last_totalprice
FROM filled
WHERE side = 1
"""


@register("q_asof_join_order_context", oracle=_ASOF_ORACLE)
def q_asof_join_order_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (events x orders): latest order at-or-before each
    event for the same customer, via union + last(IGNORE NULLS).

    Plan shape: one shuffle (hash by user_id), one sort per partition
    — identical cost profile to a single window function at any scale.
    The naive range-join alternative explodes to |events|x|orders| per
    key before aggregation; this stays linear.
    """
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("side"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    events = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "event_id",
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.coalesce(F.col("o_orderkey"), F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.unionByName(events)
        .withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("last_totalprice", F.last("o_totalprice", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "event_type", "last_orderkey", "last_totalprice")
    )


_SALTED_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("q_salted_join", oracle=_SALTED_ORACLE)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact-dim join: events salted over 8 sub-keys, the
    customer side exploded 8-fold, so a pathologically hot user_id
    spreads across 8 partitions instead of pinning one executor.
    Row-identical to the plain join (the oracle IS the plain join) —
    the salt is pure partitioning, no semantic effect.

    Use when AQE skew splitting isn't enough (single-key hotspots);
    see operators/skew.py for the cost model.
    """
    from corrie_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "value"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(ev, cust, on="c_custkey", num_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .orderBy("c_mktsegment")
    )


_MARKET_SHARE_ORACLE = """
SELECT
  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
  CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
    AS market_share,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
    AS total_revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
ORDER BY order_year
"""


@register("q_market_share", oracle=_MARKET_SHARE_ORACLE)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one nation's share of total supplier revenue per
    order year — the ratio-of-conditional-aggregates pattern computed
    in a SINGLE pass (no self-join, no second scan for the
    denominator). supplier+nation broadcast; lineitem-orders is the
    one shuffle."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0)
    dec = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    return (
        li.join(orders.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (dec(nation_rev) / dec(rev)).alias("market_share"),
            dec(rev).alias("total_revenue"),
        )
        .orderBy("order_year")
    )


_Q17_ORACLE = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0e0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.5e0 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from below-half-average-quantity orders
    of one brand — the scalar CORRELATED subquery family (avg quantity
    per part referenced from the outer predicate).

    Expressed as SQL so Catalyst's decorrelation does the planning:
    the correlated aggregate becomes a per-part aggregation joined
    back on l_partkey — two co-partitioned shuffles on partkey plus a
    broadcast of the filtered `part` dim. At 100 TB the failure mode
    this guards against is decorrelation falling back to a
    BroadcastNestedLoopJoin re-executing the subquery per row;
    tests/test_plans.py pins that no NestedLoop appears.

    Determinism: the threshold is computed identically in both engines
    (exact DECIMAL(18,6) sum -> one double division -> one double
    multiply), so boundary rows cannot flip.
    """
    return spark.sql(
        """
        SELECT
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0e0 AS DOUBLE) AS avg_yearly
        FROM {lineitem} li
        JOIN {part} ON p_partkey = li.l_partkey
        WHERE p_brand = 'Brand#1'
          AND li.l_quantity < (
            SELECT 0.5e0 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
            FROM {lineitem} l2 WHERE l2.l_partkey = p_partkey
          )
        """,
        lineitem=load(spark, sf_dir, "lineitem"),
        part=load(spark, sf_dir, "part"),
    )


_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT pl.l_suppkey FROM (
    SELECT l_suppkey, l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(18,6))) AS part_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l_suppkey, l_partkey
  ) pl
  WHERE CAST(pl.part_qty AS DOUBLE) > 0.1e0 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
    FROM lineitem l2 WHERE l2.l_partkey = pl.l_partkey
  )
)
"""


@register("q20_dominant_suppliers", oracle=_Q20_ORACLE)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style nested-EXISTS chain: suppliers who moved more
    than 10% of total volume of some 'small%' part (threshold chosen so
    the result is non-empty at every shipped sf: 10/76/250 suppliers
    at sf0.001/0.01/0.1 - a vacuous 0-row pass checks nothing) — an IN-semi-join
    whose inner block is itself an aggregation over an IN-semi-join
    with a CORRELATED scalar subquery.

    Plan shape after decorrelation: part-name filter broadcast-semi
    into lineitem, per-(supp,part) partial agg, per-part total agg
    joined back on partkey (co-partitioned shuffle), then a left-semi
    into the 100-row supplier dim. No nested-loop anywhere
    (tests/test_plans.py), no fact-side duplication — the shape that
    survives 100 TB.
    """
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM {supplier}
        WHERE s_suppkey IN (
          SELECT pl.l_suppkey FROM (
            SELECT l_suppkey, l_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,6))) AS part_qty
            FROM {lineitem}
            WHERE l_partkey IN (SELECT p_partkey FROM {part} WHERE p_name LIKE 'small%')
            GROUP BY l_suppkey, l_partkey
          ) pl
          WHERE CAST(pl.part_qty AS DOUBLE) > 0.1e0 * (
            SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
            FROM {lineitem} l2 WHERE l2.l_partkey = pl.l_partkey
          )
        )
        """,
        supplier=load(spark, sf_dir, "supplier"),
        lineitem=load(spark, sf_dir, "lineitem"),
        part=load(spark, sf_dir, "part"),
    )


_RANGE_JOIN_ORACLE = """
WITH intervals AS (
  SELECT i AS interval_id,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 30 HOUR AS w_start,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 30 HOUR
           + INTERVAL 12 HOUR AS w_end
  FROM range(0, 24) r(i)
)
SELECT
  interval_id,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM intervals JOIN events e ON e.ts >= w_start AND e.ts < w_end
GROUP BY interval_id
ORDER BY interval_id
"""


@register("q_range_join_windows", oracle=_RANGE_JOIN_ORACLE)
def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: events against 24 deterministic
    12-hour maintenance windows (30 h stride over the Jan-2024 span).

    Plan shape: operators/range_join.bucketed_range_join — intervals
    explode to their covered 12 h bins and BROADCAST; events compute
    one bin each and hash-join on it with the range predicate as the
    residual. Never a BroadcastNestedLoopJoin (pinned in
    tests/test_plans.py) — the difference between O(N x 24) theta
    comparisons and an O(N) map-side equi-join at 100 TB. The oracle
    runs the plain theta join in DuckDB over identical timestamps.
    """
    from corrie_spark.operators.range_join import bucketed_range_join

    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in micros
    stride_us = 30 * 3600 * 1_000_000
    width_us = 12 * 3600 * 1_000_000
    intervals = spark.range(24).select(
        F.col("id").alias("interval_id"),
        F.timestamp_micros(F.lit(base_us) + F.col("id") * F.lit(stride_us)).alias("w_start"),
        F.timestamp_micros(
            F.lit(base_us) + F.col("id") * F.lit(stride_us) + F.lit(width_us)
        ).alias("w_end"),
    )
    ev = load(spark, sf_dir, "events").select("ts", "value")
    joined = bucketed_range_join(
        ev, intervals, "ts", "w_start", "w_end", bin_micros=width_us
    )
    return (
        joined.groupBy("interval_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .orderBy("interval_id")
    )


_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_count_distribution", oracle=_Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of orders-per-customer INCLUDING
    zero-order customers.

    Plan shape: aggregate orders by custkey FIRST (map-side partial
    combine collapses each customer's orders before the exchange),
    then LEFT join customer -> counts on the same key (preserves
    customers with no orders as count 0 — the half an inner join
    silently drops), then a second tiny aggregation over the count
    values. Never an outer join of raw customer x orders rows followed
    by one giant groupBy: the first agg bounds the join input to one
    row per customer with orders."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("c_count")
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: supplier(s) achieving the maximum quarterly
    revenue.

    Plan shape: one shuffle (revenue per suppkey, map-side partial
    over the date-pruned lineitem scan), the revenue frame reused for
    both the scalar MAX (single-row broadcast) and the winner filter —
    equality on the DECIMAL-exact sum, so 'the max' is well-defined
    bit-for-bit in both engines; supplier dim broadcasts. A window
    max-over-all would shuffle the whole revenue frame to one
    partition; the scalar-subquery form never does."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev_dec = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        rev_dec.alias("rev_dec")
    )
    max_rev = rev.agg(F.max("rev_dec").alias("m"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev), rev.rev_dec == max_rev.m)
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal) AS a
  FROM customer WHERE c_acctbal > 0.0
),
rich_idle AS (
  SELECT c_mktsegment, c_acctbal
  FROM customer, avg_bal
  WHERE c_acctbal > a
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM rich_idle
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("q22_idle_rich_customers", oracle=_Q22_ORACLE)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average balance and NO
    orders, grouped by segment (phone-prefix grouping adapted to the
    columns this schema carries).

    Plan shape: the global average is a single-row broadcast (scalar
    subquery, never a window over all customers); NOT EXISTS is a
    left-anti join on custkey against the single-column orders scan;
    the final agg is segment-cardinality sized. AVG equality with the
    oracle: both engines compute SUM(double)/COUNT on the same scan
    order-independently via decimal accumulation."""
    cust = load(spark, sf_dir, "customer")
    from corrie_spark.queries.analytics import davg

    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "a"))
    orders_keys = load(spark, sf_dir, "orders").select("o_custkey")
    rich = cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a")).join(
        orders_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        rich.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --- Q21-style: suppliers who kept orders waiting --------------------------

_Q21_ORACLE = """
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS ns,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl,
         MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM j GROUP BY l_orderkey
),
waiting AS (
  SELECT late_supp AS s_suppkey, COUNT(*) AS numwait
  FROM per_order WHERE ns > 1 AND nl = 1
  GROUP BY late_supp
)
SELECT s.s_name, CAST(w.numwait AS BIGINT) AS numwait
FROM waiting w JOIN supplier s USING (s_suppkey)
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: for finished multi-supplier orders, the
    suppliers who were the ONLY late supplier on an order ("kept the
    order waiting"), ranked by how many orders they held up. "Late"
    adapts to this schema's columns: shipped > 60 days after the
    order date (no commit/receipt dates here).

    Plan shape — the classic Q21 rewrite: instead of the spec's
    correlated EXISTS (another supplier on the order) + NOT EXISTS
    (another LATE supplier), ONE aggregation over the order join
    computes (distinct suppliers, distinct late suppliers, the late
    supplier key) per order; nl = 1 makes MAX(late supp) exactly THE
    sole late supplier. At 100 TB this is one orderkey shuffle (the
    join's exchange is reused by the co-partitioned aggregation)
    instead of three correlated passes over lineitem; the supplier
    name join is a broadcast; the top-10 is a TakeOrdered, never a
    global sort."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    # two-level agg instead of two countDistincts: a multi-distinct
    # aggregate Expands the fact shuffle 3x (one replica per distinct
    # clause); (orderkey, suppkey) -> orderkey keeps every shuffled
    # row a single replica and bounds per-group state
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("sup_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("sup_late").alias("nl"),
        F.max(F.when(F.col("sup_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = (
        per_order.filter((F.col("ns") > 1) & (F.col("nl") == 1))
        .groupBy("late_supp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )
