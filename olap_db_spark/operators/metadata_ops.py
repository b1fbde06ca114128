"""Sampling + catalog/metadata operators — the last §2 inventory rows.

- sampling (SURVEY.md §2.3 "Sampling [implied]"): Bernoulli sample with a
  fixed seed — rows-only (sampling is engine-internal RNG by definition);
  tests bound the sampled fraction.
- metadata ops (SURVEY.md A49–A53): SHOW TABLES / SHOW DATABASES /
  SELECT 1 liveness — the reference's admin surface
  (/root/reference/drivers/connection_test.py:21-26,
  /root/reference/drivers/aiochclient_lab.py:11-12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, load, register_views
from ..registry import register


@register("sample_bernoulli", tags=("sample",))
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% Bernoulli sample of lineitem (seeded). Rows-only: RNG streams
    are engine- and partitioning-internal; the test asserts the fraction
    lands in statistical bounds. At 100 TB prefer this over LIMIT for
    data exploration — it parallelizes and needs no sort."""
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


_LIVENESS_ORACLE = "SELECT 1 AS one"


@register("meta_select_one", oracle=_LIVENESS_ORACLE, tags=("meta",))
def meta_select_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT 1` liveness probe (A53) through the SQL surface."""
    return spark.sql("SELECT 1 AS one")


@register("meta_show_tables", tags=("meta",))
def meta_show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TABLES (A49) over the engine catalog: registers the testdata
    views then lists them — sorted, names only, so the result is stable."""
    register_views(spark, sf_dir)
    return (
        spark.sql("SHOW TABLES")
        .select(F.col("tableName").alias("table_name"))
        .filter(F.col("table_name").isin(*TABLES))
        .orderBy("table_name")
    )


@register("agg_percentile_approx", tags=("agg", "approx"))
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (ClickHouse `quantile` analog) — the sketch-based
    scale path for quantiles (constant memory vs the exact rank-selection
    in agg_quantiles). Rows-only; the test bounds its error against the
    exact median."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median")
    )
