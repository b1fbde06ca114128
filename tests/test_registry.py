"""Registry integrity: the driver evaluates only the first 50 entries of
``queries()``, so ordering mistakes silently cost CORRECTNESS rows."""

from __future__ import annotations

from olap_db_spark import registry


def test_priority_names_all_registered():
    """A typo in _PRIORITY would silently drop a query from the driver's
    correctness window instead of failing loudly."""
    names = set(registry.all_queries())
    missing = [n for n in registry._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_priority_has_no_duplicates():
    pri = registry._PRIORITY
    assert len(pri) == len(set(pri))


def test_driver_window_contents():
    """The first 50 queries() entries (the driver's correctness window)
    must contain every round-2 target: all round-1-unchecked queries,
    the three repaired rows, and every operator added in round 2."""
    names = list(registry.all_queries())
    window = set(names[:50])
    must_have = {
        # repaired round-1 rows
        "agg_pivot", "func_json_extract", "agg_approx_count_distinct",
        # round-2 additions
        "sim_pq_search", "mm_real_decode_stats", "text_pack_sequences",
        "sample_stratified", "q6_forecast_revenue", "q14_promo_revenue",
        "q19_brand_band_revenue",
        # representative round-1-unchecked families
        "ts_gap_fill", "text_stats_by_lang", "dedup_minhash_lsh",
        "sim_ivf_search", "mm_binary_features", "scale_salted_skew_join",
    }
    missing = must_have - window
    assert not missing, f"driver window is missing: {sorted(missing)}"


def test_every_query_has_fn_and_most_have_oracles():
    qs = registry.all_queries()
    assert len(qs) >= 92
    no_oracle = sorted(n for n, rq in qs.items() if rq.oracle is None)
    # the PIL-gated codec stub is the single intentional rows-only query
    assert no_oracle == ["mm_decode_resize_stats"], no_oracle
