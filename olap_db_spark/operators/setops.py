"""Set-operation family (SURVEY.md §2.3 "Set ops [implied]")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _cust_nations(spark, sf_dir):
    return load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


_UNION_ALL_ORACLE = """
SELECT nationkey, COUNT(*) AS n
FROM (SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier) u
GROUP BY nationkey
"""


@register("setop_union_all", oracle=_UNION_ALL_ORACLE, tags=("setop",))
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL is a zero-shuffle concatenation of scans in Spark."""
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


_UNION_DISTINCT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_union_distinct", oracle=_UNION_DISTINCT_ORACLE, tags=("setop",))
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
"""


@register("setop_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT: customer nations minus rich-supplier nations."""
    rich = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    return _cust_nations(spark, sf_dir).subtract(
        rich.select(F.col("s_nationkey").cast("int").alias("nationkey"))
    )


_EXCEPT_ALL_ORACLE = """
SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
EXCEPT ALL
SELECT o_orderstatus AS status FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@register("setop_except_all", oracle=_EXCEPT_ALL_ORACLE, tags=("setop",))
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag difference, occurrence-counted)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderstatus").alias("status")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("status")
    )
    return a.exceptAll(b)


_INTERSECT_ALL_ORACLE = """
SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
INTERSECT ALL
SELECT o_orderstatus AS status FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@register("setop_intersect_all", oracle=_INTERSECT_ALL_ORACLE, tags=("setop",))
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (bag semantics preserved)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderstatus").alias("status")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("status")
    )
    return a.intersectAll(b)
