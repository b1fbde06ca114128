"""Catalog: the driver testdata tables as DataFrames / temp views.

The reference points its clients at a ClickHouse database
(``content_inventory`` — /root/reference/ingest.py:6); here the analogous
catalog is a directory of Parquet tables registered as Spark temp views, so
every capability is reachable both through the fluent DataFrame API and
through ``spark.sql(...)`` (the reference's dual client/SQL surface,
SURVEY.md §3.3).

At 100 TB these would be external tables (partitioned/bucketed) in a real
metastore; registration here is metadata-only — no data is read until a
query runs, so Catalyst still sees the parquet footers for pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one table. Column pruning + predicate pushdown apply."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after itself."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
