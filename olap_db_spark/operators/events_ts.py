"""Event-time operators over the `events` stream table — the streaming
capability surface (SURVEY.md §2.3-S) in its batch form. The same windowed
aggregations run under Structured Streaming in ``olap_db_spark.streaming``
(tested against these batch results — the correctness deliverable per
SURVEY.md Phase 5).

All timestamps are emitted as wall-clock strings and all bucket math is
wall-clock arithmetic — no session-timezone dependence anywhere.

Scale notes: tumbling/sliding windows are plain groupBy shuffles on
(bucket, keys); session windows shuffle once on user_id then walk each
user's timeline in order — the pattern survives 100 TB provided per-key
event counts are bounded (true for user sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register
from ._determinism import fixed_sum, sql_fixed_sum

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# --- tumbling window ----------------------------------------------------------

_TUMBLING_ORACLE = f"""
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts), '{_TS_FMT_DUCK}') AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_fixed_sum('value', 100)} AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("ts_tumbling_window", oracle=_TUMBLING_ORACLE, tags=("events", "window"))
def ts_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute tumbling windows per event type — `window()` is the
    Structured-Streaming-compatible form (same expression runs under
    readStream with a watermark)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "30 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fixed_sum(F.col("value"), 100).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- sliding window -----------------------------------------------------------

# A 1h window sliding every 30min: each event belongs to exactly 2 windows
# (window_start = bucket(ts) - k*30min, k ∈ {0,1}).
_SLIDING_ORACLE = """
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL '30 minutes',
                '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
CROSS JOIN (VALUES (0), (1)) AS k(k)
GROUP BY 1
"""


@register("ts_sliding_window", oracle=_SLIDING_ORACLE, tags=("events", "window"))
def ts_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (overlap factor 2)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "n_users",
        )
    )


# --- session window -----------------------------------------------------------

# Gaps-and-islands twin of session_window(ts, '30 minutes'): a new session
# starts when the gap to the previous event of the same user exceeds 30 min.
_SESSION_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM seq
)
SELECT user_id,
       strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
       COUNT(*) AS n_events,
       {sql_fixed_sum('value', 100)} AS sum_value
FROM sess
GROUP BY user_id, sess_no
"""


@register("ts_session_window", oracle=_SESSION_ORACLE, tags=("events", "window"))
def ts_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user —
    ``session_window`` in Spark, gaps-and-islands in the oracle."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fixed_sum(F.col("value"), 100).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# --- as-of (most recent prior event of another type) ----------------------------

_ASOF_ORACLE = f"""
WITH tagged AS (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
  FROM events
)
SELECT event_id, user_id,
       strftime(ts, '{_TS_FMT_DUCK}') AS purchase_ts,
       strftime(last_click_ts, '{_TS_FMT_DUCK}') AS prior_click_ts
FROM tagged
WHERE event_type = 'purchase'
"""


@register("ts_asof_prior_click", oracle=_ASOF_ORACLE, tags=("events", "join"))
def ts_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase ↔ latest prior click of the same user),
    implemented as a running MAX over the unioned timeline — ONE shuffle on
    user_id, no range join, no pairwise blow-up. This is the scale-correct
    as-of pattern (a naive t1≤t2 range join is quadratic per user)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = e.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format("last_click_ts", _TS_FMT_SPARK).alias("prior_click_ts"),
    )


# --- daily rollup (the reference's native daily-batch grain) ---------------------

_DAILY_ORACLE = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(*) AS n_events,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
       COUNT(DISTINCT user_id) AS dau
FROM events
GROUP BY 1
ORDER BY 1
"""


@register("ts_daily_rollup", oracle=_DAILY_ORACLE, tags=("events",))
def ts_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity rollup with conditional aggregation — the reference's
    (domain, date) fact-table grain (SURVEY.md §1.1)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
            F.countDistinct("user_id").alias("dau"),
        )
        .orderBy("day")
    )
