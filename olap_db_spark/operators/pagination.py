"""Ordering / pagination / top-k family — the reference's actual query
shapes (SURVEY.md A36–A40): ORDER BY + LIMIT/OFFSET paging
(/root/reference/rankings_generator.py:117-129,
/root/reference/s3_rankings_collector.py:133-139) and per-group top-k
(/root/reference/s3_rankings_collector.py:88 keeps top-3 per topic).

Every paged query carries a total order (unique key in the ORDER BY) —
OFFSET without one is nondeterministic (SURVEY.md §7.3 item 3).

Scale notes: global ORDER BY + LIMIT compiles to TakeOrderedAndProject
(per-partition top-k then a driver-side merge of k·partitions rows — never
a full sort). OFFSET paging re-scans per page; the scale-safe variant is
keyset pagination (WHERE key > last_seen), included below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

_SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("page_sort_limit", oracle=_SORT_LIMIT_ORACLE, tags=("page",))
def page_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 — TakeOrderedAndProject, no full sort materialized."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


_LIMIT_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@register("page_limit_offset", oracle=_LIMIT_OFFSET_ORACLE, tags=("page",))
def page_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET paging (reference A38) — page 3 of the price ranking."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
    )


_KEYSET_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey > 200
ORDER BY c_custkey
LIMIT 100
"""


@register("page_keyset", oracle=_KEYSET_ORACLE, tags=("page",))
def page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination — the scale-safe replacement for OFFSET: the
    predicate pushes into the parquet scan, so page N costs the same as
    page 1 (OFFSET paging re-reads N pages)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") > 200)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(100)
    )


_TOPK_GROUP_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem) t
WHERE rn <= 3
"""


@register("page_topk_per_group", oracle=_TOPK_GROUP_ORACLE, tags=("page",))
def page_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group (the reference's `s3_keys[:3]` per topic, A39):
    one shuffle on the group key, rank, filter — no global sort."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


_PAGED_DRAIN_ORACLE = """
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date
FROM orders
WHERE o_orderstatus = 'O' AND CAST(o_orderdate AS DATE) > DATE '1997-06-30'
ORDER BY order_date DESC, o_orderkey
LIMIT 50
"""


@register("page_filtered_sorted", oracle=_PAGED_DRAIN_ORACLE, tags=("page",))
def page_filtered_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact paged-fetch shape (A15+A36+A38): conjunctive
    pushdown predicate + ORDER BY ts DESC + LIMIT
    (/root/reference/rankings_generator.py:122-128)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderdate").cast("date") > F.lit("1997-06-30"))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy(F.col("order_date").desc(), F.col("o_orderkey"))
        .limit(50)
    )
