"""Deduplication family — DISTINCT, deterministic keep-first, and the
ClickHouse-ReplacingMergeTree-style keep-latest (SURVEY.md §2.3 "Distinct /
dedup"; reference semantics A41–A43: idempotent ingest flags at
/root/reference/ranking_urls_ingestor.py:99-114).

``dropDuplicates`` picks an ARBITRARY row per key — fine for true
duplicates, wrong for keep-latest. The deterministic version is a window
``row_number`` over an explicit priority order with a unique tie-break
(SURVEY.md §7.3 item 4), which is also the 100 TB-safe pattern: one shuffle
on the dedup key, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("dedup_distinct", oracle=_DISTINCT_ORACLE, tags=("dedup",))
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


_KEEP_FIRST_ORACLE = """
SELECT o_custkey, o_orderstatus, o_orderkey AS first_orderkey
FROM (SELECT o_custkey, o_orderstatus, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderkey) AS rn
      FROM orders) t
WHERE rn = 1
"""


@register("dedup_keep_first", oracle=_KEEP_FIRST_ORACLE, tags=("dedup",))
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dropDuplicates: lowest orderkey per (custkey, status)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderstatus", F.col("o_orderkey").alias("first_orderkey")
        )
    )


_KEEP_LATEST_ORACLE = """
SELECT user_id, event_id AS latest_event_id, event_type AS latest_type,
       value AS latest_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
"""


@register("dedup_keep_latest", oracle=_KEEP_LATEST_ORACLE, tags=("dedup", "events"))
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest event per user (ReplacingMergeTree semantics): ts DESC
    with event_id DESC tie-break. Timestamp is emitted as a wall-clock
    string so the comparison is timezone-proof."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
            F.col("value").alias("latest_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        )
    )
