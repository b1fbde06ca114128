"""Round-12 optimization guard: the multimodal synth→decode pipelines were
FUSED into one mapInPandas stage (the intermediate payload no longer
crosses the JVM boundary — guide §4.1/§2.3). These tests pin the fusion to
the original two-stage factories, which stay in the module as the
reference implementation:

- the fused stage's output rows equal the two-stage pipeline's rows
  exactly (same corpus, full-frame compare), for audio / video / BMP
  stats / BMP resize / phash;
- the fused synth bodies produce byte-identical payloads to the original
  synth pandas-UDFs for a sample of doc ids (so the "real bytes are
  synthesized and then genuinely decoded" property is preserved, not just
  the final numbers);
- the executed plans contain exactly one Python stage (MapInPandas) and
  no ArrowEvalPython — a second Python node means the double-crossing
  crept back in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_db_spark.catalog import load
from olap_db_spark.operators.multimodal_ops import (
    _AUDIO_SCHEMA,
    _BMP_STATS_SCHEMA,
    _PH_SCHEMA,
    _RESIZE_SCHEMA,
    _VID_SCHEMA,
    _make_bmp_decoder,
    _make_bmp_resize_decoder,
    _make_bmp_synth,
    _make_bmp_synth_vardim,
    _make_pcm_decoder,
    _make_pcm_synth,
    _make_phash_bmp_synth,
    _make_phash_decoder,
    _make_video_decoder,
    _make_video_synth,
    mm_audio_rms_windows,
    mm_decode_resize_stats,
    mm_real_decode_stats,
    mm_video_frame_sample,
    phash_hashes,
)
from olap_db_spark.plans.audit import plan_string

SF = "/root/testdata/sf0.001"


def _two_stage(spark, synth_factory, decoder_factory, schema):
    docs = load(spark, SF, "documents")
    payloads = docs.select(
        "doc_id", synth_factory()(F.col("doc_id")).alias("payload")
    )
    return payloads.mapInPandas(decoder_factory(), schema=schema)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_audio_equals_two_stage(spark):
    fused = _rows(mm_audio_rms_windows(spark, SF))
    ref = _rows(_two_stage(spark, _make_pcm_synth, _make_pcm_decoder, _AUDIO_SCHEMA))
    assert fused == ref and len(fused) > 0


def test_fused_video_equals_two_stage(spark):
    fused = _rows(mm_video_frame_sample(spark, SF))
    ref = _rows(
        _two_stage(spark, _make_video_synth, _make_video_decoder, _VID_SCHEMA)
    )
    assert fused == ref and len(fused) > 0


def test_fused_bmp_stats_equals_two_stage(spark):
    fused = _rows(mm_real_decode_stats(spark, SF))
    ref = _rows(
        _two_stage(spark, _make_bmp_synth, _make_bmp_decoder, _BMP_STATS_SCHEMA)
    )
    assert fused == ref and len(fused) > 0


def test_fused_resize_rollup_equals_two_stage(spark):
    # the registered query rolls up to size classes; compare the rollup
    # built over the two-stage decode with the fused query's output
    two_stage = _two_stage(
        spark, _make_bmp_synth_vardim, _make_bmp_resize_decoder, _RESIZE_SCHEMA
    )
    size_class = (
        F.when(F.col("width") <= 24, "small")
        .when(F.col("width") <= 40, "medium")
        .otherwise("large")
    )
    ref = _rows(
        two_stage.withColumn("size_class", size_class)
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.col("width") * F.col("height")).alias("total_px"),
            F.sum(F.col("thumb_w") * F.col("thumb_h")).alias("total_thumb_px"),
            F.sum("lum_sum").alias("sum_lum"),
            F.min("tmin").alias("min_block_sum"),
            F.max("tmax").alias("max_block_sum"),
        )
    )
    fused = _rows(mm_decode_resize_stats(spark, SF))
    assert fused == ref and len(fused) == 3


def test_fused_phash_equals_two_stage(spark):
    fused = _rows(phash_hashes(spark, SF))
    ref = _rows(
        _two_stage(spark, _make_phash_bmp_synth, _make_phash_decoder, _PH_SCHEMA)
    )
    assert fused == ref and len(fused) > 0


def test_fused_synth_bytes_identical(spark):
    """The fused closures still synthesize the REAL payload bytes: for a
    sample of doc ids, the bytes produced inside each fused stage equal
    the original synth UDF's output byte-for-byte. The fused synth bodies
    are exposed as module-level factories
    (``_make_bmp_fused_synth_one`` / ``_make_phash_fused_synth_one``) and
    captured by the shipped pipelines, so this assertion runs against the
    EXACT closures the executors execute (r12 ADVICE: the first cut
    re-implemented the formulas in the test, which could mask
    compensating synth+decode drift)."""
    ids = [0, 1, 2, 3, 7, 23, 62, 63, 199, 200, 499]
    id_df = spark.createDataFrame([(i,) for i in ids], "doc_id long")

    # original synth bytes
    orig_bmp = {
        r["doc_id"]: bytes(r["p"])
        for r in id_df.select(
            "doc_id", _make_bmp_synth()(F.col("doc_id")).alias("p")
        ).collect()
    }
    orig_ph = {
        r["doc_id"]: bytes(r["p"])
        for r in id_df.select(
            "doc_id", _make_phash_bmp_synth()(F.col("doc_id")).alias("p")
        ).collect()
    }

    # the SHIPPED fused synth closures (what the executors run)
    from olap_db_spark.operators.multimodal_ops import (
        _PH_GROUPS,
        _make_bmp_fused_synth_one,
        _make_phash_fused_synth_one,
    )

    fused_bmp = _make_bmp_fused_synth_one()
    fused_ph = _make_phash_fused_synth_one()

    assert _PH_GROUPS == 200
    for i in ids:
        assert fused_bmp(i) == orig_bmp[i], f"BMP synth bytes differ for {i}"
        assert fused_ph(i) == orig_ph[i], f"phash synth bytes differ for {i}"


def test_fused_plans_have_single_python_stage(spark):
    for fn in (
        mm_audio_rms_windows,
        mm_video_frame_sample,
        mm_real_decode_stats,
        mm_decode_resize_stats,
    ):
        plan = plan_string(fn(spark, SF))
        assert "ArrowEvalPython" not in plan, fn.__name__
        assert plan.count("MapInPandas") == 1, fn.__name__
