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


# --- REAL image decode (BMP — no external libs needed) -------------------------

_BMP_W, _BMP_H = 18, 12  # w*3 = 54 → 2 pad bytes per row (exercises padding)


def _make_bmp_synth():
    """Pandas UDF factory: doc_id → real 24bpp BMP bytes (deterministic
    gradient pixels lum(x,y) = (doc_id*31 + 7x + 13y) mod 256). BMP rows
    are stored BOTTOM-UP with 4-byte padding — both quirks deliberately
    exercised so the decoder has something real to get wrong.
    Self-contained closure (executor import rule)."""
    from pyspark.sql.functions import pandas_udf as _pudf

    w, h = _BMP_W, _BMP_H

    def synth(doc_ids):
        import struct as _struct

        import pandas as _pd

        row_bytes = (w * 3 + 3) // 4 * 4
        img_size = row_bytes * h
        off = 14 + 40

        def one(doc_id):
            header = b"BM" + _struct.pack("<IHHI", off + img_size, 0, 0, off)
            info = _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
            )
            out = [header, info]
            for yy in range(h):  # bottom-up storage
                y = h - 1 - yy
                row = bytearray()
                for x in range(w):
                    lum = (doc_id * 31 + x * 7 + y * 13) % 256
                    row += bytes((lum, lum, lum))
                row += b"\x00" * (row_bytes - len(row))
                out.append(bytes(row))
            return b"".join(out)

        return _pd.Series([one(int(d)) for d in doc_ids])

    return _pudf(synth, "binary")


_BMP_STATS_SCHEMA = (
    "doc_id LONG, width LONG, height LONG, lum_mean DOUBLE, "
    "lum_min LONG, lum_max LONG, tl_mean DOUBLE"
)


def _make_bmp_decoder():
    """REAL decoder as a mapInPandas closure: parses the BMP file +
    DIB headers with struct, slices pixel rows out with numpy (honoring
    row padding), flips the bottom-up row order, and reduces to stats.
    No image library involved — this is the actual bytes-to-pixels path."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def one(buf: bytes):
            assert buf[:2] == b"BM", "not a BMP"
            (off,) = _struct.unpack_from("<I", buf, 10)
            hdr_sz, w, h, _planes, bpp = _struct.unpack_from("<IiiHH", buf, 14)
            assert hdr_sz == 40 and bpp == 24, (hdr_sz, bpp)
            bottom_up = h > 0
            h = abs(h)
            row_bytes = (w * 3 + 3) // 4 * 4
            px = _np.frombuffer(buf, dtype=_np.uint8, count=row_bytes * h, offset=off)
            px = px.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
            if bottom_up:
                px = px[::-1]
            lum = px[:, :, 0].astype(_np.int64)  # grayscale: B==G==R
            tl = lum[: h // 2, : w // 2]
            return (
                w,
                h,
                float(int(lum.sum())) / (w * h),
                int(lum.min()),
                int(lum.max()),
                float(int(tl.sum())) / tl.size,
            )

        for pdf in batches:
            stats = [one(bytes(b)) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [s[0] for s in stats],
                    "height": [s[1] for s in stats],
                    "lum_mean": [s[2] for s in stats],
                    "lum_min": [s[3] for s in stats],
                    "lum_max": [s[4] for s in stats],
                    "tl_mean": [s[5] for s in stats],
                }
            )

    return decode


# The oracle never sees the BMP bytes: it recomputes the same stats from
# the pixel FORMULA over (x, y) ranges. A decoder bug (padding, row order,
# channel offset, header math) breaks the hash — the decode itself is
# what's being verified.
_BMP_ORACLE = f"""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         (d.doc_id * 31 + x.range * 7 + y.range * 13) % 256 AS lum
  FROM documents d, range(0, {_BMP_W}) x, range(0, {_BMP_H}) y
)
SELECT doc_id,
       CAST({_BMP_W} AS BIGINT) AS width,
       CAST({_BMP_H} AS BIGINT) AS height,
       CAST(SUM(lum) AS DOUBLE) / ({_BMP_W} * {_BMP_H}) AS lum_mean,
       MIN(lum) AS lum_min,
       MAX(lum) AS lum_max,
       CAST(SUM(CASE WHEN x < {_BMP_W // 2} AND y < {_BMP_H // 2}
                     THEN lum END) AS DOUBLE)
         / ({(_BMP_W // 2) * (_BMP_H // 2)}) AS tl_mean
FROM px
GROUP BY doc_id
"""


@register("mm_real_decode_stats", oracle=_BMP_ORACLE, tags=("multimodal", "northstar"))
def mm_real_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END real image pipeline: synthesize genuine 24bpp BMP bytes
    per document (bottom-up rows, 4-byte padding), DECODE them for real
    (struct header parse + numpy pixel slicing — no PIL), reduce to
    luminance stats. Oracle-checked against the closed-form pixel formula,
    so a decoder bug (padding, row order, header offsets) fails the hash.

    Scale shape: both synth and decode are Arrow-batched map-only passes —
    constant memory per task, no shuffle until the final (tiny) stats."""
    docs = load(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", _make_bmp_synth()(F.col("doc_id")).alias("payload")
    )
    return payloads.mapInPandas(_make_bmp_decoder(), schema=_BMP_STATS_SCHEMA)


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
