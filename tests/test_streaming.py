"""Streaming vs batch equivalence (SURVEY.md §7.3 item 5: streaming has no
external oracle — the batch computation on the same fixture is the ground
truth)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from olap_db_spark.catalog import load
from olap_db_spark.streaming.windows import (
    dedup_within_watermark,
    run_available_now,
    stream_events,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    """File-stream source dir: the events parquet replayed as one file."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_streaming_tumbling_equals_batch(spark, events_stream_dir):
    sdf = tumbling_counts(stream_events(spark, events_stream_dir))
    got = {
        (r["bucket_start"], r["event_type"]): r["n_events"]
        for r in run_available_now(sdf, "t_tumbling", "append")
    }
    batch = (
        load(spark, SF, "events")
        .groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("b"),
            "event_type",
            "n_events",
        )
    )
    want = {(r["b"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # availableNow emits only windows the final watermark passed; every
    # emitted window must match batch, and coverage must be near-total.
    assert got, "stream produced no windows"
    for k, v in got.items():
        assert want.get(k) == v, k
    assert len(got) >= len(want) - 5  # tail windows may be held back


def test_streaming_dedup_drops_replayed_ids(spark, events_stream_dir, tmp_path):
    # duplicate the file → every event_id arrives twice
    dup_dir = tmp_path / "dup"
    dup_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", dup_dir / "a.parquet")
    shutil.copy(f"{SF}/events.parquet", dup_dir / "b.parquet")
    sdf = dedup_within_watermark(stream_events(spark, str(dup_dir)))
    rows = run_available_now(
        sdf.select("event_id"), "t_dedup", "append"
    )
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)), "duplicates survived"
    assert len(set(ids)) == 1000


def test_streaming_sessions_equal_batch(spark, events_stream_dir):
    from olap_db_spark.streaming.windows import sessionized

    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in run_available_now(
            sessionized(stream_events(spark, events_stream_dir)), "t_sess", "append"
        )
    }
    batch = (
        load(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("s"),
            "n_events",
        )
    )
    want = {(r["user_id"], r["s"]): r["n_events"] for r in batch.collect()}
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert want.get(k) == v, k
    assert len(got) >= len(want) - 20  # watermark may hold back tail sessions


def test_stream_stream_join_equals_batch(spark, events_stream_dir):
    """Stream-stream interval self-join (purchase ← prior-hour clicks)
    must emit exactly the batch join's pairs on a bounded replay."""
    from olap_db_spark.streaming.windows import purchase_click_attribution

    events = stream_events(spark, events_stream_dir)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in run_available_now(
            purchase_click_attribution(events), "t_ssjoin", "append"
        )
    }
    e = load(spark, SF, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(
            clicks,
            F.expr(
                "c_user_id = user_id AND click_ts <= purchase_ts "
                "AND click_ts >= purchase_ts - INTERVAL 1 HOUR"
            ),
        ).collect()
    }
    assert want, "batch join produced no pairs — fixture too small"
    # watermark may hold back pairs near the stream tail; everything
    # emitted must be correct and coverage must be near-complete
    assert got <= want
    assert len(got) >= len(want) - 20


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Checkpointed source offsets survive restart: re-running the same
    query over the same checkpoint reprocesses NOTHING; only genuinely
    new input files produce new sink rows — the exactly-once contract a
    production streaming job relies on."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "a.parquet")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            stream_events(spark, str(src))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 > 0
    run_once()  # restart, no new input: nothing reprocessed
    assert spark.read.parquet(sink).count() == n1
    shutil.copy(f"{SF}/events.parquet", src / "b.parquet")  # new file arrives
    run_once()  # restart picks up exactly the new file
    assert spark.read.parquet(sink).count() == 2 * n1


def test_streaming_ohlc_equals_batch(spark, events_stream_dir):
    """Streaming OHLC bars must equal the batch aggregate on the replayed
    fixture — open/close come from min_by/max_by whose states merge
    across triggers."""
    from olap_db_spark.streaming.windows import ohlc_bars

    got = {
        (r["bucket_start"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"],
        )
        for r in run_available_now(
            ohlc_bars(stream_events(spark, events_stream_dir)), "t_ohlc", "append"
        )
    }
    key = F.concat(
        F.lpad(F.unix_timestamp(F.col("ts").cast("timestamp")).cast("string"), 12, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    batch = (
        load(spark, SF, "events")
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("b"),
            "event_type",
            "open", "high", "low", "close", "volume",
        )
    )
    want = {
        (r["b"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"],
        )
        for r in batch.collect()
    }
    assert got, "stream produced no bars"
    for k, v in got.items():
        assert want.get(k) == v, k
    assert len(got) >= len(want) - 5  # tail windows may be held back


def test_streaming_hybrid_retrieval_equals_batch(spark, tmp_path):
    """r8 VERDICT stretch (b): per-trigger hybrid retrieval over a
    continuously appended embedding corpus. The embeddings arrive in two
    file-stream triggers; each trigger appends a manifest-lite delta to
    the versioned corpus and commits the fused top-10 as one atomic
    results version. After the last trigger the results HEAD must equal
    the BATCH sim_hybrid_rrf_ivf over the full table (stream == batch),
    and replaying a committed batch id must commit nothing."""
    from olap_db_spark.operators.relevance import sim_hybrid_rrf_ivf
    from olap_db_spark.sources import versioned as V
    from olap_db_spark.streaming.retrieval import hybrid_retrieval_handler

    # split the embeddings fixture into two arrival files, vec_id 0 (the
    # query anchor) in the first so every trigger's retrieval is well-posed
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = tmp_path / "arrivals"
    src.mkdir()
    emb.filter("vec_id < 250").coalesce(1).write.parquet(str(src / "f1.parquet"))
    emb.filter("vec_id >= 250").coalesce(1).write.parquet(str(src / "f2.parquet"))

    corpus = str(tmp_path / "corpus")
    results = str(tmp_path / "results")
    handler = hybrid_retrieval_handler(SF, corpus, results)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(V.versions(corpus)) == 2, "one corpus delta per trigger"
    assert V.read_head(spark, corpus).count() == emb.count()
    assert len(V.versions(results)) == 2, "one results version per trigger"

    got = sorted(tuple(r) for r in V.read_head(spark, results).collect())
    want = sorted(tuple(r) for r in sim_hybrid_rrf_ivf(spark, SF).collect())
    assert got == want, "stream != batch on the full corpus"

    # replay of a committed trigger: neither table commits anything
    handler(emb.filter("vec_id >= 250"), 1)
    assert len(V.versions(corpus)) == 2
    assert len(V.versions(results)) == 2
    # a crash BETWEEN the two commits heals on replay: wipe the results
    # marker's visibility by replaying a batch id committed to the corpus
    # only
    handler(emb.filter("vec_id >= 250"), 7)  # corpus gains a (dup) delta
    assert len(V.versions(corpus)) == 3
    assert len(V.versions(results)) == 3, "results not re-derived on replay"
