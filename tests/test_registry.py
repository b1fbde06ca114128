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
    must contain every round-4 target: the two round-3 hash-red queries
    (repaired by the ts-unit detection), every query never driver-checked
    (new in round 4), and the events-based ts_* family whose shared
    loader changed this round."""
    names = list(registry.all_queries())
    window = set(names[:50])
    r3 = set(json.loads(pathlib.Path("CORRECTNESS_r03.json").read_text()))
    never_checked = {
        n
        for n in names
        if not any(
            n in json.loads(pathlib.Path(f"CORRECTNESS_r0{i}.json").read_text())
            for i in (1, 2, 3)
            if pathlib.Path(f"CORRECTNESS_r0{i}.json").exists()
        )
    }
    must_have = (
        {"window_range_frame", "dedup_keep_latest"}  # round-3 reds
        | never_checked
        | {n for n in names if n.startswith("ts_")}  # loader changed
    )
    missing = must_have - window
    assert not missing, f"driver window is missing: {sorted(missing)}"


def test_every_query_has_fn_and_oracle():
    qs = registry.all_queries()
    assert len(qs) >= 94
    no_oracle = sorted(n for n, rq in qs.items() if rq.oracle is None)
    # since round 3 every registered query is fully oracle-checked
    assert no_oracle == [], no_oracle
