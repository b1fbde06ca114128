from __future__ import annotations

from olap_db_spark.operators.metadata_ops import (
    agg_percentile_approx,
    meta_show_tables,
    sample_bernoulli,
)

SF01 = "/root/testdata/sf0.01"


def test_sample_fraction_bounds(spark):
    n = sample_bernoulli(spark, SF01).count()
    # 10% of 60k lineitems; 5σ bounds
    assert 4500 < n < 7500, n


def test_show_tables_lists_catalog(spark):
    names = [r["table_name"] for r in meta_show_tables(spark, SF01).collect()]
    assert "lineitem" in names and "embeddings" in names
    assert names == sorted(names)


def test_percentile_approx_near_exact(spark, duck):
    approx = {
        r["o_orderstatus"]: r["approx_median"]
        for r in agg_percentile_approx(spark, SF01).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT o_orderstatus, median(o_totalprice) FROM orders GROUP BY 1"
        ).fetchall()
    )
    for k, v in exact.items():
        assert abs(approx[k] - v) / v < 0.02, (k, approx[k], v)
