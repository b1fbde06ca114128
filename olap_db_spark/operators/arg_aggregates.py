"""ClickHouse aggregate-combinator parity: argMax/argMin, topK, and the
OHLC downsample every ClickHouse time-series deployment runs.

The reference's backend is ClickHouse (/root/reference/docker-compose.yml,
clickhouse-driver clients throughout); ``argMax(col, ord)``, ``topK(n)``
and OHLC rollups are the iconic aggregate surface a user of that backend
would reach for. Spark-first mapping: ``max_by``/``min_by`` (hash-aggregate
with map-side partial — one shuffle of pre-combined state, the right shape
at 100 TB), a windowed exact top-k (bounded k per group), and a single
hash-aggregate for OHLC (no window pass over the full table).

Determinism contract: ``max_by`` ties are engine-arbitrary, so every
ordering key here is made GLOBALLY UNIQUE by appending the row's primary
key. DuckDB's ``arg_max`` does not accept struct ordering keys, so the
composite is a fixed-width zero-padded string — lexicographic order equals
numeric order for non-negative fixed-width integers, identically in both
engines. (Production would order by the raw numeric column and accept
arbitrary tie-break; the string composite is the bit-reproducibility
harness, same pattern as the scaled-integer float sums in
``_determinism.py``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register
from ._determinism import fixed_sum, sql_fixed_sum
from .windows import wall_seconds

# --- argMax / argMin ---------------------------------------------------------

# cents are exact (2 dp money-as-double, per-row product is IEEE-exact);
# orderkey < 1e12 in any TPC-H scale this repo touches.
_ARG_KEY_SPARK = (
    "lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING), 14, '0')"
    " || lpad(CAST(o_orderkey AS STRING), 12, '0')"
)
_ARG_KEY_SQL = (
    "lpad(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 14, '0')"
    " || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')"
)

_ARGMAX_ORACLE = f"""
SELECT o_orderstatus,
       arg_max(o_orderkey, {_ARG_KEY_SQL}) AS max_price_orderkey,
       arg_min(o_orderkey, {_ARG_KEY_SQL}) AS min_price_orderkey,
       arg_max(o_custkey,  {_ARG_KEY_SQL}) AS max_price_custkey,
       MAX(o_totalprice) AS max_price,
       MIN(o_totalprice) AS min_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("agg_argmax_family", oracle=_ARGMAX_ORACLE, tags=("agg",))
def agg_argmax_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMax/argMin (ClickHouse combinator parity) via ``max_by``/``min_by``:
    per order status, which order (and which customer) carries the extreme
    price. One hash aggregate, partial map-side combine; MAX/MIN of the raw
    doubles are exact (no summation)."""
    o = load(spark, sf_dir, "orders")
    key = F.expr(_ARG_KEY_SPARK)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", key).alias("max_price_orderkey"),
            F.min_by("o_orderkey", key).alias("min_price_orderkey"),
            F.max_by("o_custkey", key).alias("max_price_custkey"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy("o_orderstatus")
    )


# --- topK (exact, windowed) --------------------------------------------------

_TOPK_ORACLE = """
SELECT event_type, props, cnt, rnk
FROM (SELECT event_type, props, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, props ASC) AS rnk
      FROM (SELECT event_type, props, COUNT(*) AS cnt
            FROM events GROUP BY event_type, props) c) r
WHERE rnk <= 3
ORDER BY event_type, rnk
"""


@register("agg_topk_per_key", oracle=_TOPK_ORACLE, tags=("agg", "events"))
def agg_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topK(3) analog: the 3 most frequent ``props`` payloads per event
    type, exact. Count-then-window: the window runs over the (small)
    aggregated counts, never the raw events — at 100 TB the heavy input is
    reduced by the hash aggregate first, and the per-group sort is bounded
    by the distinct-value count, not the row count. Tie-break: props ASC."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "props").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("props").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy("event_type", "rnk")
    )


# --- OHLC hourly downsample --------------------------------------------------

# open/close ordering: (whole second, event_id) — a TOTAL order (event_id is
# unique) built identically in both engines; sub-second ordering is
# deliberately not consulted.
_OHLC_KEY_SQL = (
    "lpad(CAST(wall_s AS VARCHAR), 12, '0')"
    " || lpad(CAST(event_id AS VARCHAR), 12, '0')"
)

_OHLC_ORACLE = f"""
SELECT event_type, bucket_s,
       arg_min(value, {_OHLC_KEY_SQL}) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, {_OHLC_KEY_SQL}) AS close,
       COUNT(*) AS volume,
       {sql_fixed_sum('value', 100)} AS sum_value
FROM (SELECT event_type, event_id, value,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) * 86400
             + date_part('hour', ts) * 3600
             + date_part('minute', ts) * 60
             + date_part('second', ts) AS wall_s,
             (CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) * 86400
              + date_part('hour', ts) * 3600
              + date_part('minute', ts) * 60
              + date_part('second', ts)) // 3600 * 3600 AS bucket_s
      FROM events) t
GROUP BY event_type, bucket_s
ORDER BY event_type, bucket_s
"""


@register("agg_ohlc_hourly", oracle=_OHLC_ORACLE, tags=("agg", "events", "ts"))
def agg_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical ClickHouse
    time-series downsample (open = first value in bucket, close = last,
    by (second, event_id) order). ONE hash aggregate with map-side
    combine: open/close via ``min_by``/``max_by`` on the composite key —
    no window pass, no per-bucket sort, so the plan is a single shuffle
    of pre-combined bars however large the event stream. high/low/open/
    close pass raw doubles through unsummed (exact); the bucket sum uses
    the scaled-integer pattern."""
    e = load(spark, sf_dir, "events")
    e = e.withColumn("wall_s", wall_seconds(F.col("ts")))
    e = e.withColumn("bucket_s", F.expr("wall_s DIV 3600 * 3600"))
    key = F.concat(
        F.lpad(F.col("wall_s").cast("string"), 12, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.groupBy("event_type", "bucket_s")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            fixed_sum(F.col("value"), 100).alias("sum_value"),
        )
        .orderBy("event_type", "bucket_s")
    )
