"""Structured Streaming surface (SURVEY.md §2.3-S, Phase 5).

The batch event-time operators (operators/events_ts.py) are the
correctness deliverable; this module runs the SAME aggregation expressions
under ``readStream`` with watermarks — the batch results are the oracle
(tests/test_streaming.py asserts stream==batch on the replayed fixture).

Design: the events parquet is replayed as a file stream with
``trigger(availableNow=True)`` (bounded backfill — exactly how a 100 TB
historical replay starts a streaming job). Watermarks bound state: 1 h of
event-time lateness ⇒ state is one hour of open windows per key, however
large the backlog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import _EVENTS_RAW_SCHEMA, events_ts_unit, rebuild_ts_ntz

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-stream over events parquet with the same unit-detected
    INT64→TIMESTAMP_NTZ rebuild as the batch catalog
    (olap_db_spark.catalog._load_events)."""
    raw = spark.readStream.schema(_EVENTS_RAW_SCHEMA).parquet(events_dir)
    return (
        rebuild_ts_ntz(raw, events_ts_unit(events_dir))
        # Watermarks require TIMESTAMP (not NTZ). Under the engine's
        # UTC-pinned session (session.get_spark) the cast is wall-clock
        # exact; streaming entry points should use that factory.
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """30-min tumbling counts per event type — streaming twin of
    operators/events_ts.ts_tumbling_window (same window expression)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "30 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("bucket_start"),
            "event_type",
            "n_events",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows per user (stateful merge under watermark)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Stateful streaming dedup on event_id — state expires with the
    watermark instead of growing forever (the streaming analog of the
    ingest-once flags, SURVEY.md A42)."""
    return events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def purchase_click_attribution(events: DataFrame) -> DataFrame:
    """STREAM-STREAM interval self-join: each purchase joined to the same
    user's clicks from the preceding hour — the attribution primitive.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire join state (clicks older than
    purchase_ts − 1h are dropped): state stays O(1 hour of events per
    user) no matter how long the stream runs — the requirement for a
    stream-stream join to survive at 100 TB/day."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        F.expr(
            "c_user_id = user_id AND "
            "click_ts <= purchase_ts AND "
            "click_ts >= purchase_ts - INTERVAL 1 HOUR"
        ),
        "inner",
    ).select(
        "purchase_id",
        "user_id",
        F.date_format("purchase_ts", _TS_FMT).alias("purchase_ts"),
        "click_id",
        F.date_format("click_ts", _TS_FMT).alias("click_ts"),
    )


def run_available_now(sdf: DataFrame, query_name: str, output_mode: str) -> list:
    """Execute a bounded replay into the in-memory sink and return rows.
    (Tests/dev harness — production jobs point writeStream at Parquet/Kafka
    with a checkpoint location.)"""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = sdf.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def ohlc_bars(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of operators/arg_aggregates.agg_ohlc_hourly: hourly
    OHLC bars per event type under a watermark. min_by/max_by aggregate
    states merge associatively, so partial bars combine across triggers
    exactly like partial shuffles combine in batch — the property that
    lets one streaming job maintain the bars a batch backfill would
    produce."""
    key = F.concat(
        F.lpad(F.unix_timestamp("ts").cast("string"), 12, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("bucket_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )
