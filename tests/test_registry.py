"""Registry integrity: the driver evaluates only the first 50 entries of
``queries()``, so ordering mistakes silently cost CORRECTNESS rows."""

from __future__ import annotations

import json
import pathlib

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
    must contain every round-3 target (VERDICT r2 'Next round' #1): the
    42 queries whose latest driver row is round-1, the repaired
    mm_decode_resize_stats, the two new A50/A51 metadata queries, and
    the 5 flagships."""
    names = list(registry.all_queries())
    window = set(names[:50])
    r1 = set(json.loads(pathlib.Path("CORRECTNESS_r01.json").read_text()))
    r2 = set(json.loads(pathlib.Path("CORRECTNESS_r02.json").read_text()))
    must_have = (r1 - r2) | {
        # repaired in round 3: stub → real decode+resize with full oracle
        "mm_decode_resize_stats",
        # new in round 3 (A50/A51)
        "meta_show_databases",
        "meta_show_create_table",
        # flagships: continuous evidence
        "q1_pricing_summary", "q3_top_revenue_orders",
        "q5_local_supplier_volume", "q4_priority_exists",
        "q17_small_qty_revenue",
    }
    missing = must_have - window
    assert not missing, f"driver window is missing: {sorted(missing)}"


def test_every_query_has_fn_and_oracle():
    qs = registry.all_queries()
    assert len(qs) >= 94
    no_oracle = sorted(n for n, rq in qs.items() if rq.oracle is None)
    # since round 3 every registered query is fully oracle-checked
    assert no_oracle == [], no_oracle
