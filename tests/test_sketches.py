"""Sketch-operator contracts that go beyond the hash-parity gate:
count-min overestimate + error bound, Bloom zero-false-negative, and the
z-order cell-extent invariant the layout's data-skipping relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_db_spark.catalog import load
from olap_db_spark.operators.sketches import (
    _CMS_W,
    bloom_prefilter_count,
    cms_estimate,
)
from olap_db_spark.operators.scale_techniques import scale_zorder_layout
from tests.conftest import SF_SMOKE


def test_cms_overestimates_within_bound(spark):
    li = load(spark, SF_SMOKE, "lineitem")
    n_total = li.count()
    true = {
        r["l_partkey"]: r["cnt"]
        for r in li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc())
        .limit(10)
        .collect()
    }
    est = cms_estimate(spark, SF_SMOKE, list(true))
    # CMS guarantee: never underestimates; error ≤ e·N/W with prob 1-e^-depth.
    # 3× slack on the expected-error bound keeps the test deterministic-safe.
    slack = max(3, 3 * 2.72 * n_total // _CMS_W)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
        assert est[k] - t <= slack, (k, est[k], t, slack)


def test_bloom_no_false_negatives(spark):
    n_fact, n_cand, n_true = bloom_prefilter_count(spark, SF_SMOKE)
    # No false negatives: every true match passes the prefilter.
    assert n_true <= n_cand <= n_fact
    # The filter actually filters (selective dim → most rows rejected).
    assert n_cand < n_fact


def test_zorder_cells_are_small_rectangles(spark):
    # A 64-code z-cell fixes bits 3..7 of both dimensions, so each cell's
    # extent in x AND y is at most 2^3 - 1 — the invariant parquet min/max
    # skipping exploits on both dimensions simultaneously.
    rows = scale_zorder_layout(spark, SF_SMOKE).collect()
    assert rows, "no cells"
    for r in rows:
        assert r["max_x"] - r["min_x"] <= 7, r
        assert r["max_y"] - r["min_y"] <= 7, r


def test_zorder_write_path_clusters_both_dims(spark, tmp_path):
    # The 100 TB write recipe: repartitionByRange + sortWithinPartitions on
    # the Morton code. Each output file then covers a bounded slice of the
    # z-range, hence bounded rectangles in (x, y).
    from olap_db_spark.operators.scale_techniques import _z_interleave

    o = load(spark, SF_SMOKE, "orders")
    dims = o.select(
        (F.col("o_custkey") % 256).cast("long").alias("x"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            % 256
        )
        .cast("long")
        .alias("y"),
    ).withColumn("zval", _z_interleave(F.col("x"), F.col("y")))
    out = str(tmp_path / "zordered")
    dims.repartitionByRange(4, "zval").sortWithinPartitions("zval").write.parquet(out)
    back = spark.read.parquet(out)
    # Per-file z-ranges must be (nearly) disjoint: max of file i ≤ min of
    # file i+1 under range partitioning.
    stats = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(stats) >= 2
    for a, b in zip(stats, stats[1:]):
        assert a["hi"] <= b["lo"], (a, b)


def test_heavy_hitter_prefilter_contract(spark):
    """CMS-gated heavy hitters: (a) zero false negatives — every row of a
    TRUE heavy key passes the prefilter (the overestimate-only side of
    the CMS contract, which is what makes the exact-confirm plan equal
    to the plain GROUP BY/HAVING the oracle runs); (b) the prefilter
    actually prunes — the high-cardinality tail never reaches the exact
    count's exchange."""
    from olap_db_spark.operators.sketches import (
        _hh_cells,
        _hh_fact,
        _hh_total,
        hh_prefilter_count,
    )

    n_fact, n_cand, n_true = hh_prefilter_count(spark, "/root/testdata/sf0.001")
    assert n_true <= n_cand  # no false negatives
    assert n_cand < n_fact  # the tail is dropped map-side
    # the constructed skew guarantees heavy keys exist at every SF
    assert n_true > 0

    # (c) the N the query uses comes from the counter table, not a third
    # fact scan (r10 VERDICT #4) — one depth's cell counts sum to N exactly
    fact = _hh_fact(spark, "/root/testdata/sf0.001")
    assert _hh_total(_hh_cells(fact)) == fact.count()
