"""Join operator family — the backend-implied join surface (SURVEY.md §2.3)
plus the reference's one join-shaped pipeline (A48: the chained key-equality
lookups across Postgres→DynamoDB→S3, /root/reference/s3_rankings_collector.py:145-149,
re-expressed as equi-joins).

Scale notes: every equi-join here shuffles on its key unless one side is
broadcast-able; Catalyst + AQE pick broadcast automatically for the dims
(region/nation/supplier). The banded non-equi join broadcasts an inline
bands table — a nested-loop join against a 5-row broadcast, constant cost
per row at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from ._determinism import fixed_sum, sql_fixed_sum

# --- inner join chain (A48 shape: dim → dim → fact) -----------------------

_INNER_ORACLE = f"""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_customers,
       {sql_fixed_sum('c.c_acctbal', 100)} AS total_acctbal
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
"""


@register("join_inner_chain", oracle=_INNER_ORACLE, tags=("join",))
def join_inner_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained equi-joins region⋈nation⋈customer (the A48 lookup chain).

    region/nation broadcast; customer streams — no shuffle of the fact side.
    """
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            fixed_sum(F.col("c_acctbal"), 100).alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


# --- left outer ------------------------------------------------------------

_LEFT_ORACLE = f"""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS order_cnt,
       {sql_fixed_sum('o.o_totalprice', 100)} AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@register("join_left_outer", oracle=_LEFT_ORACLE, tags=("join",))
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join preserving customers with zero orders (NULL-safe agg)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            fixed_sum(F.col("o_totalprice"), 100).alias("total_spent"),
        )
    )


# --- right outer ------------------------------------------------------------

_RIGHT_ORACLE = """
SELECT o.o_orderkey, COUNT(l.l_linenumber) AS line_cnt
FROM lineitem l
RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey
"""


@register("join_right_outer", oracle=_RIGHT_ORACLE, tags=("join",))
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "right")
        .groupBy("o_orderkey")
        .agg(F.count("l_linenumber").alias("line_cnt"))
    )


# --- full outer -------------------------------------------------------------

_FULL_ORACLE = """
SELECT COALESCE(cc.nationkey, sc.nationkey) AS nationkey,
       cc.customer_cnt, sc.supplier_cnt
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS customer_cnt
      FROM customer GROUP BY c_nationkey) cc
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, COUNT(*) AS supplier_cnt
      FROM supplier GROUP BY s_nationkey) sc
ON cc.nationkey = sc.nationkey
"""


@register("join_full_outer", oracle=_FULL_ORACLE, tags=("join",))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nation coverage diff)."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("customer_cnt"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    )
    return c.join(s, "nationkey", "full").select(
        "nationkey", "customer_cnt", "supplier_cnt"
    )


# --- semi / anti -------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""


@register("join_left_semi", oracle=_SEMI_ORACLE, tags=("join",))
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one pending order (EXISTS ≡ left_semi)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""


@register("join_left_anti", oracle=_ANTI_ORACLE, tags=("join",))
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no pending order (NOT EXISTS ≡ left_anti) — also the
    engine's idempotent-ingest primitive (SURVEY.md A42: anti-join against
    the ingest log to skip already-ingested keys)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- cross ------------------------------------------------------------------

_CROSS_ORACLE = """
SELECT r.r_name, m.segment
FROM region r
CROSS JOIN (SELECT DISTINCT c_mktsegment AS segment FROM customer) m
"""


@register("join_cross", oracle=_CROSS_ORACLE, tags=("join",))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    m = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    return r.crossJoin(m).select("r_name", "segment")


# --- non-equi (banded/range) join -------------------------------------------

_BANDS = [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)]
_BANDS_SQL = ", ".join(f"({lo}, {hi})" for lo, hi in _BANDS)

_BAND_ORACLE = f"""
SELECT b.lo AS band_lo, b.hi AS band_hi,
       COUNT(*) AS n_items,
       {sql_fixed_sum('l.l_extendedprice', 100)} AS band_price
FROM lineitem l
JOIN (VALUES {_BANDS_SQL}) AS b(lo, hi)
  ON l.l_quantity >= b.lo AND l.l_quantity <= b.hi
GROUP BY b.lo, b.hi
ORDER BY b.lo
"""


@register("join_nonequi_band", oracle=_BAND_ORACLE, tags=("join",))
def join_nonequi_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: lineitem banded by quantity against an inline
    bands table (BroadcastNestedLoopJoin against the tiny bands side).

    Partial aggregation is pushed BELOW the theta join: the fact is first
    reduced to one row per distinct quantity (~50), so the nested-loop
    condition evaluates 50×|bands| times instead of |fact|×|bands| — the
    plan that matters at 100 TB, where the pre-aggregate is a cheap
    map-side combine and the non-equi join touches only the digest.
    Integer-cents partials re-aggregate exactly, so the result is
    bit-identical to the row-level oracle."""
    li = load(spark, sf_dir, "lineitem")
    per_qty = li.groupBy("l_quantity").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col("l_extendedprice") * F.lit(100)).cast("long")).alias(
            "cents"
        ),
    )
    bands = spark.createDataFrame(_BANDS, "lo INT, hi INT")
    cond = (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") <= F.col("hi"))
    return (
        per_qty.join(F.broadcast(bands), cond)
        .groupBy(F.col("lo").alias("band_lo"), F.col("hi").alias("band_hi"))
        .agg(
            F.sum("cnt").alias("n_items"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias("band_price"),
        )
        .orderBy("band_lo")
    )
