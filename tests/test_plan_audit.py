"""Physical-plan regression gate: the scale promises asserted by
``plans/audit.py`` (pushdown, broadcast, top-k, partial aggregation, no
cartesian blow-ups) now fail CI instead of relying on the standalone
``python -m olap_db_spark.plans.audit`` report (round-4 VERDICT item 6c).

Plans are built at sf0.001 — plan SHAPE (join strategy with explicit
broadcast hints, TakeOrderedAndProject, partial aggregates, Arrow nodes)
does not depend on input volume, and nothing here executes a job."""

from __future__ import annotations

import pytest

from olap_db_spark import registry
from olap_db_spark.plans.audit import (
    _FLAGSHIP_CHECKS,
    _no_global_window_over,
    generic_violations,
    plan_string,
)

SF = "/root/testdata/sf0.001"

_CASES = [
    (name, label, needle)
    for name, checks in _FLAGSHIP_CHECKS.items()
    for label, needle in checks
]


@pytest.mark.parametrize(
    ("name", "label", "needle"),
    _CASES,
    ids=[f"{n}-{l.replace(' ', '_')}" for n, l, _ in _CASES],
)
def test_plan_property(spark, name, label, needle):
    df = registry.all_queries()[name].fn(spark, SF)
    plan = plan_string(df)
    if needle.startswith("!"):
        assert needle[1:] not in plan, f"{name}: unexpected {needle[1:]} ({label})"
    else:
        assert needle in plan, f"{name}: missing {needle} ({label})"


@pytest.mark.parametrize("name", sorted(registry.all_queries()))
def test_generic_scale_gate(spark, name):
    """Universal 100 TB screen over EVERY registered query (r6 VERDICT
    item 4): no CartesianProduct, AQE wraps every shuffling plan, no
    unfused global-sort-under-limit. A new operator can no longer land
    with a scale-killer plan unnoticed."""
    df = registry.all_queries()[name].fn(spark, SF)
    assert generic_violations(df, name) == []


@pytest.mark.parametrize("name", ["ts_gap_fill", "text_pack_sequences"])
def test_no_global_window_over_data(spark, name):
    df = registry.all_queries()[name].fn(spark, SF)
    assert _no_global_window_over(df, "bucket"), (
        f"{name}: heavy window is not bucket-partitioned"
    )
