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
from pyspark.sql import functions as F

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


_EVENTS_RAW_SCHEMA = (
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
    we read the physical INT64 directly (explicit schema — works on any
    session, no legacy conf) and rebuild a TIMESTAMP_NTZ wall-clock column
    with pure integer arithmetic. No timezone is consulted anywhere, so
    results match the DuckDB oracle under any driver session timezone."""
    raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    # All integer ops (DIV/%) — nanos ~1.7e18 would lose precision as double.
    return (
        raw.withColumn("_s", F.expr("ts DIV 1000000000"))
        .withColumn("_d", F.date_add(F.lit("1970-01-01").cast("date"), F.expr("CAST(_s DIV 86400 AS INT)")))
        .withColumn(
            "ts",
            F.expr(
                "make_timestamp_ntz(year(_d), month(_d), day(_d),"
                " CAST((_s % 86400) DIV 3600 AS INT),"
                " CAST((_s % 3600) DIV 60 AS INT),"
                " CAST((ts DIV 1000) % 60000000 AS DOUBLE) / 1000000.0)"
            ),
        )
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one table. Column pruning + predicate pushdown apply."""
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after itself."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
