"""Streaming CMS == batch CMS on the same data, replayed as multiple
files so the sketch is genuinely assembled across micro-batch merges."""

from __future__ import annotations

import shutil

import pytest

from olap_db_spark.operators.sketches import agg_count_min_sketch
from olap_db_spark.streaming.sketches import (
    cms_sketch_stream,
    stream_lineitem_keys,
)
from olap_db_spark.streaming.windows import run_available_now

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem_stream_dir(tmp_path_factory, spark):
    """Replay lineitem as THREE files: availableNow processes them as
    separate micro-batches (maxFilesPerTrigger default groups, but
    distinct files still exercise state merge across input splits)."""
    d = tmp_path_factory.mktemp("lineitem_stream")
    src = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_partkey")
    src.repartition(3).write.parquet(str(d / "staged"))
    n = 0
    for f in (d / "staged").glob("part-*.parquet"):
        shutil.copy(f, d / f"replay-{n}.parquet")
        n += 1
    shutil.rmtree(d / "staged")
    assert n >= 2
    return str(d)


def test_streaming_cms_equals_batch(spark, lineitem_stream_dir):
    sdf = cms_sketch_stream(stream_lineitem_keys(spark, lineitem_stream_dir))
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in run_available_now(sdf, "t_cms", "complete")
    }
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in agg_count_min_sketch(spark, SF).collect()
    }
    assert got == want
    # bounded-by-construction state: never more cells than the grid
    assert len(got) <= 4 * 256


@pytest.fixture(scope="module")
def orders_stream_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("orders_stream")
    src = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    src.repartition(3).write.parquet(str(d / "staged"))
    n = 0
    for f in (d / "staged").glob("part-*.parquet"):
        shutil.copy(f, d / f"replay-{n}.parquet")
        n += 1
    shutil.rmtree(d / "staged")
    assert n >= 2
    return str(d)


def test_streaming_bloom_bitmap_equals_batch(spark, orders_stream_dir):
    from olap_db_spark.operators.sketches import _BLOOM_WORDS, bloom_bitmap
    from olap_db_spark.streaming.sketches import (
        bloom_bitmap_stream,
        stream_order_keys,
    )

    sdf = bloom_bitmap_stream(stream_order_keys(spark, orders_stream_dir))
    got = {
        (r["word_idx"]): r["w"] for r in run_available_now(sdf, "t_bloom", "complete")
    }
    keys = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    want = {r["word_idx"]: r["w"] for r in bloom_bitmap(keys, "o_orderkey").collect()}
    assert got == want
    assert len(got) <= _BLOOM_WORDS
