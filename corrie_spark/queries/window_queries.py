"""Batch twins of the event-time streaming operators (stream/batch
unification: the same corrie_spark.streaming.events functions run
here on a batch DataFrame and inside a StreamingQuery in the
streaming tests — one definition, two execution modes).

Timestamp rendering: window/session boundaries are rendered as
strings at second precision so Spark/DuckDB timestamp-type plumbing
can't diverge (same convention as q_events_hourly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corrie_spark.queries.registry import register
from corrie_spark.streaming.events import session_event_stats, windowed_event_counts
from corrie_spark.tables import load

_WINDOWED_ORACLE = """
SELECT
  strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL '15 minutes', ts), event_type
"""


@register("q_events_windowed", oracle=_WINDOWED_ORACLE)
def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-min event-time windows (batch mode of the streaming
    windowed agg — identical operator, no watermark). One shuffle on
    (window, event_type); 15-min buckets align between Spark's epoch
    origin and DuckDB's time_bucket because 900 s divides both."""
    ev = load(spark, sf_dir, "events")
    out = windowed_event_counts(ev, watermark=None)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


_SESSION_WINDOW_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT
  user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
  COUNT(*) AS n_events
FROM islands
GROUP BY user_id, session_no
"""


@register("q_session_windows", oracle=_SESSION_WINDOW_ORACLE)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session stats via the native session_window operator (batch
    mode of the streaming sessionizer). The oracle is the equivalent
    gaps-and-islands SQL: session_window merges events with gaps
    <= 30 min (boundary-inclusive: an event exactly 30 min after the
    last one extends the session), end = last event + gap."""
    ev = load(spark, sf_dir, "events")
    out = session_event_stats(ev, watermark=None)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


_HYPER_ORACLE = """
SELECT
  COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
  COALESCE(EXTRACT(HOUR FROM ts), -1) AS hr,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP(date_trunc('day', ts), EXTRACT(HOUR FROM ts))
"""


@register("q_hypertable_rollup", oracle=_HYPER_ORACLE)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: hour -> day -> total
    subtotals in ONE pass (rollup = grouping sets), instead of three
    separate aggregations over the fact table. At 100 TB this is the
    continuous-aggregate pattern: one scan, partial aggs map-side,
    subtotal rows materialize at the final stage."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("hr", F.hour("ts").cast("bigint"))
        .rollup("day", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("hr", F.lit(-1)).alias("hr"),
            "n_events",
            "sum_value",
        )
    )


_FUNNEL_ORACLE = """
WITH steps AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
flags AS (
  SELECT user_id,
    CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
    CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS s2,
    CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
         THEN 1 ELSE 0 END AS s3
  FROM steps
)
SELECT
  CAST(SUM(s1) AS BIGINT) AS n_viewed,
  CAST(SUM(s2) AS BIGINT) AS n_clicked_after,
  CAST(SUM(s3) AS BIGINT) AS n_purchased_after,
  CAST(SUM(s3) AS DOUBLE) / greatest(SUM(s1), 1) AS view_to_purchase
FROM flags
"""


@register("q_event_funnel", oracle=_FUNNEL_ORACLE)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): users counted at a
    step only if the step's FIRST occurrence is strictly after the
    previous step's first occurrence. One conditional-min aggregation
    per user — a single shuffle regardless of event volume (never a
    per-step self-join, which would be k shuffles and k scans)."""
    ev = load(spark, sf_dir, "events")

    def first_ts(etype: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    steps = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.when(F.col("t_view").isNotNull(), 1).otherwise(0)
    s2 = F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1).otherwise(0)
    s3 = F.when(
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click")),
        1,
    ).otherwise(0)
    return steps.agg(
        F.sum(s1).cast("bigint").alias("n_viewed"),
        F.sum(s2).cast("bigint").alias("n_clicked_after"),
        F.sum(s3).cast("bigint").alias("n_purchased_after"),
        (F.sum(s3).cast("double") / F.greatest(F.sum(s1), F.lit(1))).alias(
            "view_to_purchase"
        ),
    )


_RETENTION_ORACLE = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
cohort AS (
  SELECT user_id, MIN(d) AS first_day FROM user_days GROUP BY user_id
)
SELECT
  strftime(c.first_day, '%Y-%m-%d') AS cohort_day,
  COUNT(DISTINCT c.user_id) AS cohort_size,
  COUNT(DISTINCT CASE WHEN u.d = c.first_day + 1 THEN c.user_id END) AS retained_d1,
  COUNT(DISTINCT CASE WHEN u.d = c.first_day + 7 THEN c.user_id END) AS retained_d7
FROM cohort c
JOIN user_days u USING (user_id)
GROUP BY c.first_day
ORDER BY cohort_day
"""


@register("q_cohort_retention", oracle=_RETENTION_ORACLE)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention (d1/d7): cohort = first active day per
    user. distinct(user, day) first — the join and both distinct
    counts run on user-days (bounded by users x days), never raw
    events; both stages shuffle on user_id so the partitioning is
    reused."""
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    cohort = user_days.groupBy("user_id").agg(F.min("d").alias("first_day"))
    joined = user_days.join(cohort, "user_id")
    ret = lambda days: F.countDistinct(  # noqa: E731
        F.when(F.col("d") == F.date_add(F.col("first_day"), days), F.col("user_id"))
    )
    return (
        joined.groupBy(F.date_format("first_day", "yyyy-MM-dd").alias("cohort_day"))
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            ret(1).alias("retained_d1"),
            ret(7).alias("retained_d7"),
        )
        .orderBy("cohort_day")
    )


_SLIDING_ORACLE = """
WITH expanded AS (
  SELECT e.event_type, e.value,
         time_bucket(INTERVAL '15 minutes', e.ts) - o.off * INTERVAL '15 minutes'
           AS w_start
  FROM events e
  CROSS JOIN (SELECT unnest([0, 1]) AS off) o
)
SELECT
  strftime(w_start, '%Y-%m-%d %H:%M') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM expanded
GROUP BY w_start, event_type
"""


@register("q_events_sliding", oracle=_SLIDING_ORACLE)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 30-min windows every 15 min: each event lands in
    duration/slide = 2 overlapping windows. Spark's window() expands
    the assignment map-side (one output row per event per window)
    before the single aggregation shuffle — the oracle mirrors that
    expansion with an explicit 2-offset cross join. Streaming twin:
    same call with a watermark."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
span AS (
  SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM span
),
filled AS (
  SELECT g.event_type, g.h, COALESCE(hourly.n, 0) AS n
  FROM grid g LEFT JOIN hourly ON hourly.event_type = g.event_type AND hourly.h = g.h
)
SELECT event_type,
  COUNT(*) AS n_hours_span,
  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hours_present,
  CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hours_filled,
  CAST(SUM(n) AS BIGINT) AS total_events
FROM filled GROUP BY event_type
"""


@register("q_time_gapfill", oracle=_GAPFILL_ORACLE)
def q_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap filling (the time_bucket_gapfill shape of
    hypertable engines): per event type, generate the full hourly grid
    over that type's observed span, left-join the real hourly counts,
    and account for present vs zero-filled buckets.

    Scale shape: the grid is built from per-type (min, max) — a
    #types-row frame exploded by sequence(), never a cross join over
    raw events; the fill join is broadcast (grid side is tiny), and
    the hourly agg shuffles once with map-side combine."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    filled = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    return filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours_span"),
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).cast("bigint").alias("n_hours_present"),
        F.sum(F.when(F.col("n") == 0, 1).otherwise(0)).cast("bigint").alias("n_hours_filled"),
        F.sum("n").cast("bigint").alias("total_events"),
    )


# --- day-over-day anomaly flags (lag deltas + MAD threshold) ---------------

_ANOMALY_ORACLE = """
WITH days AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
deltas AS (
  SELECT day, n_events,
         n_events - LAG(n_events) OVER (ORDER BY day) AS delta
  FROM days
),
m AS (SELECT median(abs(delta)) AS mad FROM deltas WHERE delta IS NOT NULL)
SELECT d.day, d.n_events,
       CAST(d.delta AS BIGINT) AS delta,
       CASE WHEN d.delta IS NULL THEN FALSE
            ELSE abs(d.delta) > 3 * m.mad END AS anomaly
FROM deltas d CROSS JOIN m
ORDER BY d.day
"""


@register("q_anomaly_days", oracle=_ANOMALY_ORACLE)
def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day volume anomaly screen: daily event counts, lag
    deltas, and a robust MAD threshold (|delta| > 3 * median|delta|)
    — the rollup-store alert a pipeline would run nightly. The day
    series is #days rows, so the lag window and the scalar MAD are
    metadata-sized at any raw scale; only the daily count aggregation
    touches the events table (one partial-agg shuffle)."""
    ev = load(spark, sf_dir, "events")
    days = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w = Window.orderBy("day")
    deltas = days.withColumn(
        "delta", (F.col("n_events") - F.lag("n_events").over(w)).cast("bigint")
    )
    mad = deltas.filter(F.col("delta").isNotNull()).agg(
        F.median(F.abs("delta")).alias("mad")
    )
    return (
        deltas.crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n_events",
            "delta",
            F.when(F.col("delta").isNull(), F.lit(False))
            .otherwise(F.abs("delta") > 3 * F.col("mad"))
            .alias("anomaly"),
        )
        .orderBy("day")
    )


# --- per-type trailing-window rate alert (z-score) -------------------------

# One shared double expression: exact-int window sums first, then IEEE
# ops in a fixed order (sqrt is correctly rounded) — identical engines.
_ZSCORE = (
    "CASE WHEN cnt = 7 AND 7 * s2 - s * s > 0 THEN"
    " (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / 7.0)"
    " / sqrt((7.0 * CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / 49.0)"
    " END"
)

_RATE_ZSCORE_ORACLE = f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, day, n,
         CAST(COUNT(*) OVER w AS BIGINT) AS cnt,
         CAST(SUM(n) OVER w AS BIGINT) AS s,
         CAST(SUM(n * n) OVER w AS BIGINT) AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n AS n_events,
       {_ZSCORE} AS z_score,
       COALESCE(abs({_ZSCORE}) > 2.0, FALSE) AS alert
FROM win
ORDER BY event_type, day
"""


def rate_zscore_from_daily(daily: DataFrame) -> DataFrame:
    """Trailing-7-day z-score alert from a (event_type, day, n) daily
    count frame — shared by the batch query (daily counts straight
    off the events scan) and the STREAMING serve path (daily counts
    merged from the continuous-aggregate rollup store, which sums to
    the same exact integers; streaming/rate_alert.py). Exact-integer
    window sums, one shared double expression."""
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    win = daily.select(
        "event_type",
        "day",
        "n",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt"),
        F.sum("n").over(w).cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("bigint").alias("s2"),
    )
    z = F.expr(_ZSCORE)
    return win.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        z.alias("z_score"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("alert"),
    ).orderBy("event_type", "day")


@register("q_events_rate_zscore", oracle=_RATE_ZSCORE_ORACLE)
def q_events_rate_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-rate alert: z-score of each day's event count
    against its OWN trailing 7 observed days (window excludes the
    current day, so a spike can't suppress its own alarm) — the
    per-key streaming-alert twin of the global MAD screen. Variance
    comes from exact-integer window sums (n, n²); the single double
    expression evaluates identically in both engines, sqrt included.
    The day series per type is metadata-sized at any raw scale; only
    the daily rollup touches the events table."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return rate_zscore_from_daily(daily)
