"""Multimodal-column operators (BASELINE.json north_star: "multimodal
columns"): image/audio/video as opaque BINARY payloads with typed metadata,
processed by Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio libraries, so the DECODE step is stubbed
(import-gated, NotImplementedError for real codecs) behind a deterministic
fake — but everything Spark-side is real and tested: the binary column
construction, the metadata struct schema, the mapInPandas batch iteration,
its output schema, and the partitioning of the pipeline.

``mm_binary_features`` is even fully oracle-checked: the "features" the
stub extracts (byte length, md5, head bytes) are deterministic functions
of the payload that DuckDB can compute from the same source text.

Scale notes: mapInPandas streams Arrow batches — constant memory per task
regardless of table size; binary payloads never pass through Python row
objects. For 100 TB media, payloads stay in object storage and the binary
column holds (uri, offset, nbytes) pointers — same schema, same pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

try:  # pragma: no cover — not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # noqa: BLE001
    _HAS_PIL = False


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload BINARY, meta STRUCT) — the engine's
    canonical multimodal row shape."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text-bytes").alias("modality"),
            F.length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


_FEATURES_SCHEMA = (
    "doc_id LONG, n_bytes LONG, content_md5 STRING, head_hex STRING"
)


def _make_extract_features():
    """Build the mapInPandas function as a SELF-CONTAINED closure.

    Worker-side functions must not reference this package: cloudpickle
    serializes module-level functions by reference, and executor Python
    workers (driver-owned session, arbitrary cwd) cannot import
    ``olap_db_spark``. A nested closure referencing only stdlib/pandas is
    pickled by value and runs anywhere."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: _hl.md5(bytes(b)).hexdigest()
                    ),
                    "head_hex": payloads.map(lambda b: bytes(b)[:4].hex()),
                }
            )

    return extract


_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       lower(hex(encode(substr(text, 1, 4)))) AS head_hex
FROM documents
"""


@register("mm_binary_features", oracle=_FEATURES_ORACLE, tags=("multimodal", "northstar"))
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through a real mapInPandas
    pipeline, oracle-checked: the fake 'decode' emits deterministic
    features DuckDB derives from the same bytes. (Texts are ASCII so the
    char/byte substr equivalence in the oracle holds.)"""
    docs = load(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(_make_extract_features(), schema=_FEATURES_SCHEMA)


_DECODE_SCHEMA = (
    "doc_id LONG, modality STRING, width INT, height INT, n_frames INT, "
    "feat0 DOUBLE, feat1 DOUBLE"
)


def _make_decode_stub(has_pil: bool):
    """STUB image/video decode factory (self-contained closure — see
    _make_extract_features). With PIL absent, emits a deterministic fake
    decode (dimensions/features derived from the payload md5) so the full
    pipeline — schema, batching, downstream aggregation — is real."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            if has_pil:
                raise NotImplementedError(
                    "real image decode path: Image.open(BytesIO(payload)) — "
                    "enable when payloads carry actual image bytes"
                )
            digests = pdf["payload"].map(lambda b: _hl.md5(bytes(b)).digest())
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": "image-fake",
                    "width": digests.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "height": digests.map(lambda d: 64 + d[1] % 192).astype(
                        "int32"
                    ),
                    "n_frames": digests.map(lambda d: 1 + d[2] % 4).astype(
                        "int32"
                    ),
                    "feat0": digests.map(lambda d: d[3] / 255.0),
                    "feat1": digests.map(lambda d: d[4] / 255.0),
                }
            )

    return decode


@register("mm_decode_resize_stats", tags=("multimodal", "northstar"))
def mm_decode_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → 'resize' bucket → aggregate: the full multimodal pipeline
    shape (decode stubbed, plumbing real). Rows-only check — the fake
    decode is Spark-side-only by design; pytest asserts determinism across
    runs and partitionings."""
    docs = load(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    decoded = payloads.mapInPandas(_make_decode_stub(_HAS_PIL), schema=_DECODE_SCHEMA)
    # "resize": bucket into thumbnail size classes, aggregate per class
    bucket = (
        F.when((F.col("width") <= 128) & (F.col("height") <= 128), "small")
        .when((F.col("width") <= 192) & (F.col("height") <= 192), "medium")
        .otherwise("large")
    )
    return (
        decoded.withColumn("size_class", bucket)
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_frames").alias("total_frames"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("size_class")
    )
