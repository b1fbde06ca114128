"""Scale techniques as first-class, verified operators — the "would this
survive 100 TB?" toolbox: key salting for skewed joins and AQE-driven skew
handling. (Bucketed co-located joins are exercised in
tests/test_bucketing.py — they need table writes, which driver-contract
queries must not do.)

The salted join is oracle-checked: salting is a pure execution-strategy
rewrite, so its RESULT must equal the plain join the oracle computes —
exactly the property worth asserting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from ._determinism import fixed_sum, sql_fixed_sum

_N_SALTS = 8

# Construct a deliberately skewed key: ~half of all lineitems collapse
# onto hot_key 0; the rest keep their order key. Both engines build the
# identical skewed dataset, so the oracle checks the salted join's result
# against a plain join on the same skew.
_SKEW_KEY_SQL = "CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE l_orderkey END"

_SALTED_ORACLE = f"""
WITH fact AS (
  SELECT {_SKEW_KEY_SQL} AS skew_key, l_extendedprice FROM lineitem
),
dim AS (
  SELECT o_orderkey AS skew_key, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1 OR o_orderkey = 0
  UNION ALL
  SELECT 0 AS skew_key, '0-HOT' AS o_orderpriority
)
SELECT d.o_orderpriority,
       COUNT(*) AS n_rows,
       {sql_fixed_sum('f.l_extendedprice', 100)} AS total_price
FROM fact f JOIN dim d ON d.skew_key = f.skew_key
GROUP BY d.o_orderpriority
ORDER BY d.o_orderpriority
"""


@register("scale_salted_skew_join", oracle=_SALTED_ORACLE, tags=("scale", "join"))
def scale_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join over a key where ~50% of rows share one value.

    Technique: fact rows get `salt = crc32(unique) % S`; the dim side is
    exploded S× with every salt, and the join key becomes (key, salt) —
    the hot key's rows spread across S reducers instead of one. The
    oracle is the UNSALTED join: identical results prove the rewrite is
    semantics-preserving. At 100 TB this (or AQE skew-join, enabled in
    session.py) is the difference between a straggler task holding the
    stage for hours and even progress."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    fact = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("skew_key"),
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
    )
    dim = o.filter((F.col("o_orderkey") % 2 == 1) | (F.col("o_orderkey") == 0)).select(
        F.col("o_orderkey").alias("skew_key"), "o_orderpriority"
    ).unionAll(
        spark.createDataFrame([(0, "0-HOT")], "skew_key LONG, o_orderpriority STRING")
    )

    # Salt from the ROW identity (original orderkey+linenumber), not the
    # skewed key — a salt derived from low-cardinality columns collapses
    # to few buckets exactly on the hot key it's meant to spread.
    salted_fact = fact.withColumn(
        "salt",
        F.crc32(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber")))
        % _N_SALTS,
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s).cast("long") for s in range(_N_SALTS)]))
    )
    joined = salted_fact.join(salted_dim, ["skew_key", "salt"])
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            fixed_sum(F.col("l_extendedprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


_REPART_ORACLE = """
SELECT l_suppkey, COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_suppkey
"""


@register("scale_repartition_agg", oracle=_REPART_ORACLE, tags=("scale",))
def scale_repartition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pre-partitioning on the aggregation key: `repartition(k)`
    then groupBy reuses the partitioning (no second shuffle) — the manual
    analog of bucketing for one-shot pipelines, and the pattern for
    reusing one shuffle across several downstream aggs."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.repartition(16, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )
