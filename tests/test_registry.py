"""Registry integrity: the driver evaluates only the first 50 entries of
``queries()``, so ordering mistakes silently cost CORRECTNESS rows."""

from __future__ import annotations

import json
import pathlib

from olap_db_spark import registry

# Queries that intentionally carry no DuckDB oracle: float-evaluation
# companions whose exact-integer inputs ARE oracle-checked (bm25/bigram
# split, round 4); their float math is covered by bounded-error pytest
# contracts in tests/test_exact_moments.py / tests/test_relevance.py.
_ROWS_ONLY_OK = {"text_bm25_topk", "text_bigram_nll_topk"}


def _correctness(round_no: int) -> dict:
    p = pathlib.Path(f"CORRECTNESS_r0{round_no}.json")
    return json.loads(p.read_text()) if p.exists() else {}


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
    must contain every round-5 target: the four round-4 hash-red queries
    (re-engineered to integer-only hashed outputs), every query never
    driver-checked, and every query whose latest driver row is round 2
    (stalest evidence)."""
    names = list(registry.all_queries())
    window = set(names[:50])

    rounds = [_correctness(i) for i in (1, 2, 3, 4)]
    never_checked = {n for n in names if not any(n in r for r in rounds)}

    def latest_round(name: str) -> int:
        return max((i + 1 for i, r in enumerate(rounds) if name in r), default=0)

    r4_reds = {
        n
        for n, rec in rounds[3].items()
        if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"])
    }
    r2_stale = {n for n in names if latest_round(n) == 2}

    must_have = r4_reds | never_checked | r2_stale
    missing = must_have - window
    assert not missing, f"driver window is missing: {sorted(missing)}"


def test_every_query_has_fn_and_oracle():
    qs = registry.all_queries()
    assert len(qs) >= 113
    no_oracle = sorted(n for n, rq in qs.items() if rq.oracle is None)
    assert no_oracle == sorted(_ROWS_ONLY_OK), no_oracle
