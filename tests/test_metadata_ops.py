from __future__ import annotations

from olap_db_spark.operators.metadata_ops import (
    agg_percentile_approx,
    meta_show_tables,
    sample_bernoulli,
)

SF01 = "/root/testdata/sf0.01"


def test_sample_fraction_bounds(spark):
    """The query now RETURNS the 5σ-bound assertion (driver-hashable);
    the test checks the assertion holds and the totals are sane."""
    rows = sample_bernoulli(spark, SF01).collect()
    assert len(rows) == 1
    assert rows[0]["n_total"] > 50_000
    assert rows[0]["frac_in_bounds"] is True


def test_show_tables_lists_catalog(spark):
    names = [r["table_name"] for r in meta_show_tables(spark, SF01).collect()]
    assert "lineitem" in names and "embeddings" in names
    assert names == sorted(names)
    # the probe namespace is torn down afterwards
    dbs = [r[0] for r in spark.sql("SHOW DATABASES").collect()]
    assert "olap_meta_probe_tables" not in dbs


def test_show_databases_probe(spark):
    from olap_db_spark.operators.metadata_ops import meta_show_databases

    names = [r["db_name"] for r in meta_show_databases(spark, SF01).collect()]
    assert names == ["default", "olap_meta_probe_db"]
    dbs = [r[0] for r in spark.sql("SHOW DATABASES").collect()]
    assert "olap_meta_probe_db" not in dbs


def test_show_create_table_contract(spark):
    from olap_db_spark.operators.metadata_ops import meta_show_create_table

    row = meta_show_create_table(spark, SF01).collect()[0]
    assert row["table_name"] == "probe_rankings"
    assert row["has_domain_string"] and row["has_rank_int"]
    assert row["has_volume_bigint"] and row["uses_parquet"]


def test_percentile_approx_near_exact(spark, duck):
    """The query returns the exact rank-selected median plus the
    sketch-within-(p45,p55) assertion; verify both against DuckDB."""
    rows = {
        r["o_orderstatus"]: r for r in agg_percentile_approx(spark, SF01).collect()
    }
    exact = dict(
        duck.execute(
            """
            WITH ranked AS (
              SELECT o_orderstatus, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                        ORDER BY o_totalprice, o_orderkey) rn,
                     COUNT(*) OVER (PARTITION BY o_orderstatus) n
              FROM orders)
            SELECT o_orderstatus,
                   MAX(CASE WHEN rn = CAST(CEIL(n*0.5) AS BIGINT)
                            THEN o_totalprice END)
            FROM ranked GROUP BY 1
            """
        ).fetchall()
    )
    for k, v in exact.items():
        assert rows[k]["exact_median"] == v
        assert rows[k]["within_bounds"] is True


def test_stratified_sample_bounds(spark):
    from olap_db_spark.operators.text_analysis import sample_stratified

    rows = sample_stratified(spark, SF01).collect()
    assert len(rows) == 5
    assert all(r["frac_in_bounds"] is True for r in rows)


def test_pack_sequences_invariants(spark):
    """Bins are contiguous in doc_id order; every bin's token total stays
    under budget + one max doc; tokens_before is the exact prefix sum."""
    from olap_db_spark.operators.text_analysis import (
        _PACK_BUDGET,
        text_pack_sequences,
    )

    rows = sorted(
        text_pack_sequences(spark, SF01).collect(), key=lambda r: r["doc_id"]
    )
    run = 0
    prev_bin = 0
    for r in rows:
        assert r["tokens_before"] == run
        assert r["bin_id"] == run // _PACK_BUDGET
        assert r["bin_id"] >= prev_bin
        prev_bin = r["bin_id"]
        run += r["n_tokens"]
