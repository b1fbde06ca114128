"""Streaming twin of the corpus-curation pipeline (operators/
text_analysis.pipeline_corpus_curation) — the continuous-ingest shape of a
training-data pipeline: documents arrive as files, pass the SAME quality
filter (integer cross-product thresholds), and are exact-deduped with
watermark-BOUNDED state via ``dropDuplicatesWithinWatermark``.

The batch pipeline is the oracle (tests/test_streaming_curation.py asserts
stream==batch on the replayed fixture), mirroring how the events windows are
verified.

Scale: the quality filter is stateless map/filter work; dedup state is one
watermark-interval of 16-byte fingerprints per partition — bounded however
long the job runs, which is precisely what an unbounded-state
``dropDuplicates`` would NOT give at 100 TB/day ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import quality_signals

_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_documents(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-stream over documents parquet. Documents carry no event time,
    so a deterministic synthetic ingest timestamp (epoch + doc_id seconds)
    stands in — the same role an object-store arrival time plays in a real
    continuous-ingest job, but reproducible for the stream==batch test."""
    raw = spark.readStream.schema(_DOCS_SCHEMA).parquet(docs_dir)
    return raw.withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))
    )


def curate_stream(docs: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Quality filter → watermarked exact dedup, the streaming form of the
    batch pipeline's first two stages (same thresholds, same fingerprint).

    Batch keeps the LOWEST doc_id per fingerprint; the file stream replays
    rows in doc_id order, and ``dropDuplicatesWithinWatermark`` keeps the
    first arrival, so the two agree on the fixture — asserted by the test,
    not assumed."""
    sig = quality_signals(F.col("text"))
    quality = docs.select(
        "doc_id",
        "lang",
        "text",
        "ingest_ts",
        sig["n_tokens"].cast("long").alias("n_tokens"),
        sig["n_uniq"].cast("long").alias("_uniq"),
        sig["stop_hits_en"].cast("long").alias("_stop"),
    ).filter(
        (F.col("n_tokens") >= 30)
        & (F.col("_uniq") * 10 >= F.col("n_tokens") * 3)
        & (F.col("_stop") * 2 <= F.col("n_tokens"))
    )
    fp = quality.withColumn("fp", F.md5(F.lower(F.trim(F.col("text")))))
    return (
        fp.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "lang", "n_tokens")
    )


_SPAN_LEN, _SPAN_STRIDE = 32, 16  # mirrors operators/fuzzy_dedup.dedup_span_exact


def span_dedup_stream(docs: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of span-level exact dedup
    (operators/fuzzy_dedup.dedup_span_exact): as documents arrive, every
    32-token window (stride 16) is fingerprinted and the stream keeps only
    the FIRST arrival of each span — the continuous boilerplate-suppression
    form of substring dedup (all later repeats of a paragraph are dropped
    at ingest, before they ever reach training storage).

    State is watermark-bounded: one watermark-interval of 16-byte span
    fingerprints, not the unbounded history an un-watermarked
    ``dropDuplicates`` would accumulate at 100 TB/day. The span explode is
    stateless map-side fan-out (≈2 fingerprints per 32 tokens), identical
    to the batch operator's scale shape."""
    t = docs.select(
        "doc_id",
        "ingest_ts",
        F.split(F.trim(F.col("text")), " ").alias("ws"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n"),
    ).filter(F.col("n") >= _SPAN_LEN)
    spans = t.select(
        "doc_id",
        "ingest_ts",
        F.explode(
            F.expr(f"sequence(0, n - {_SPAN_LEN}, {_SPAN_STRIDE})")
        ).alias("p"),
        "ws",
    ).select(
        "doc_id",
        "ingest_ts",
        F.md5(
            F.array_join(F.expr(f"slice(ws, p + 1, {_SPAN_LEN})"), " ")
        ).alias("fp"),
    )
    return (
        spans.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("fp", "doc_id")
    )


def incremental_dedup_stream(
    docs: DataFrame, base_fp: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of incremental (cross-snapshot) dedup
    (operators/fuzzy_dedup.dedup_incremental): a continuously arriving
    batch is deduped against the STORED corpus fingerprint table, and
    within itself, as it lands — the continuous-ingest form of
    "append only what the corpus has never seen".

    ``base_fp`` is the static fingerprint table (one 16-byte md5 ``fp``
    column — at 100 TB this is the accumulated corpus state, bucketed by
    fp). The stream-static LEFT ANTI join is STATELESS — each micro-batch
    probes the static side and drops known fingerprints without
    accumulating any state; only the within-batch first-arrival dedup
    carries state, and that is watermark-bounded via
    ``dropDuplicatesWithinWatermark`` (one watermark-interval of
    fingerprints, not the unbounded ingest history). Emits exactly the
    docs the batch operator marks ``keep=1``, modulo the documented
    within-micro-batch winner ambiguity among same-fp arrivals."""
    fp = docs.select(
        "doc_id",
        "ingest_ts",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    fresh = fp.join(base_fp.select("fp"), "fp", "left_anti")
    return (
        fresh.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "fp")
    )


# --- continuous domain-drift (KL) monitoring ---------------------------------


def domain_token_counts_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of text_domain_kl's count state: the continuously
    maintained (source, w) token counts — a streaming aggregation whose
    micro-batch partials merge associatively (outputMode 'complete' emits
    the whole state each trigger, exactly like the CMS twin).

    State is O(sources · vocabulary) regardless of stream volume — the
    same bound the batch operator's shuffle carries; drift is then
    evaluated per trigger by ``domain_kl_from_count_state`` (the SHARED
    batch evaluator), which is how a curation pipeline watches a crawl
    slice go off-distribution WHILE ingesting, not after."""
    tok = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    return tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw"))


def domain_kl_from_count_state(counts: DataFrame) -> DataFrame:
    """Per-trigger KL evaluation over the streamed count state — LITERALLY
    the batch evaluator (operators/text_analysis.domain_kl_from_counts),
    so stream==batch holds by construction once the states match
    (asserted in tests/test_streaming_curation.py)."""
    from ..operators.text_analysis import domain_kl_from_counts

    return domain_kl_from_counts(counts)
