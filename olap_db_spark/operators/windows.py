"""Window-function operator family (SURVEY.md §2.3 "Window functions").

Every window here carries a TOTAL order within its partition (unique
tie-break key) so running aggregates are deterministic — the same rule the
survey flags for OFFSET pagination (SURVEY.md §7.3 item 3/4).

Scale note: a window shuffles once on partitionBy keys; frames evaluate
stream-wise within each partition. Skewed partitions (one giant customer)
are the risk at 100 TB — AQE skew handling does not apply inside windows,
so partition keys are chosen with bounded cardinality per key here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

# --- ranking family ----------------------------------------------------------

_RANK_ORACLE = """
SELECT o_custkey, o_orderkey,
       RANK()       OVER w AS price_rank,
       DENSE_RANK() OVER w AS price_dense_rank,
       NTILE(4)     OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
"""


@register("window_ranking", oracle=_RANK_ORACLE, tags=("window",))
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (tie-stable by definition) + ntile with a unique
    order so bucket assignment is deterministic."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wt = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
    )


# --- running aggregates (ROWS frame) ------------------------------------------

_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 100.0 AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


@register("window_running_sum", oracle=_RUNNING_ORACLE, tags=("window",))
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer — integer-cents running sum so every
    prefix is order-independent exact."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = F.round(F.col("o_totalprice") * F.lit(100)).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w).cast("double") / F.lit(100.0)).alias("running_spend"),
        F.row_number().over(wo).cast("long").alias("order_seq"),
    )


# --- lag / lead / first / last --------------------------------------------------

_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       o_totalprice - LAG(o_totalprice) OVER w AS delta_vs_prev,
       LEAD(o_orderkey) OVER w AS next_orderkey,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS first_orderkey,
       LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_lag_lead", oracle=_LAG_ORACLE, tags=("window",))
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last over a total per-customer order.

    delta is a single double subtraction of two raw column values —
    IEEE-deterministic, no accumulation."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias(
            "delta_vs_prev"
        ),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(wf).alias("first_orderkey"),
        F.last("o_orderkey").over(wf).alias("last_orderkey"),
    )


# --- RANGE frame over event time -----------------------------------------------

# Wall-clock second index (days-since-epoch*86400 + h*3600 + m*60 + s):
# computed from datetime FIELDS, not epoch(), so the value is identical in
# both engines regardless of the session timezone the driver happens to use.
_RANGE_ORACLE = """
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY wall_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         AS events_last_hour
FROM (SELECT event_id, user_id,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) * 86400
             + date_part('hour', ts) * 3600
             + date_part('minute', ts) * 60
             + date_part('second', ts) AS wall_s
      FROM events) t
"""


def wall_seconds(ts):
    """Timezone-proof wall-clock second index of a timestamp column."""
    return (
        F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour(ts) * 3600
        + F.minute(ts) * 60
        + F.second(ts)
    )


@register("window_range_frame", oracle=_RANGE_ORACLE, tags=("window", "events"))
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (trailing 1 h per user) over event time — the rolling
    count the reference's daily-batch time-series layout implies. Ties in
    ORDER BY are harmless: RANGE frames are value-defined."""
    e = load(spark, sf_dir, "events")
    e = e.withColumn("wall_s", wall_seconds(F.col("ts")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("wall_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
    )


# --- distribution window functions -------------------------------------------

_DIST_ORACLE = """
SELECT o_custkey, o_orderkey,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING)
         AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


@register("window_distribution", oracle=_DIST_ORACLE, tags=("window",))
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value — the distribution window
    family. The ordering carries a unique tie-break (o_orderkey), so
    ranks are total; percent_rank and cume_dist are exact small-integer
    ratios — bit-identical across engines with no scaling needed."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_cheapest"),
    )
