"""Registry integrity: the driver evaluates only the first 50 entries of
``queries()``, so ordering mistakes silently cost CORRECTNESS rows."""

from __future__ import annotations

import json
import pathlib

from olap_db_spark import registry

# Round-5 lesson: the driver records ``err: no_oracle`` for oracle-less
# registrations — "rows-only at the driver" is NOT part of the contract.
# Every query must carry an oracle (float evaluations get floor-quantized
# integer surfaces instead); this set must stay empty.
_ROWS_ONLY_OK: set[str] = set()


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
    must contain every round-6 target: every round-5 red/err query
    (the repaired HUGEINT-oracle hash-reds + the no_oracle errs) and
    every query never driver-checked (the round-6 additions)."""
    names = list(registry.all_queries())
    window = set(names[:50])

    rounds = [_correctness(i) for i in (1, 2, 3, 4, 5)]
    never_checked = {n for n in names if not any(n in r for r in rounds)}

    r5_bad = {
        n
        for n, rec in rounds[4].items()
        if not (rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"))
    }

    must_have = r5_bad | never_checked
    missing = must_have - window
    assert not missing, f"driver window is missing: {sorted(missing)}"


def test_every_query_has_fn_and_oracle():
    qs = registry.all_queries()
    assert len(qs) >= 113
    no_oracle = sorted(n for n, rq in qs.items() if rq.oracle is None)
    assert no_oracle == sorted(_ROWS_ONLY_OK), no_oracle
