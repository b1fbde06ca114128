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
    # zero-pad to TWO digits, not a literal "0" prefix — the literal broke
    # at round 10 (CORRECTNESS_r010.json), silently blinding the staleness
    # math to the newest artifact
    p = pathlib.Path(f"CORRECTNESS_r{round_no:02d}.json")
    return json.loads(p.read_text()) if p.exists() else {}


def _rounds() -> list[int]:
    """Every committed driver round, discovered from the artifact series —
    hard-coding the list silently froze staleness math at round 6."""
    return sorted(
        int(p.stem.split("_r")[1])
        for p in pathlib.Path(".").glob("CORRECTNESS_r*.json")
    )


def test_priority_names_all_registered():
    """A typo in _PRIORITY would silently drop a query from the driver's
    correctness window instead of failing loudly."""
    names = set(registry.all_queries())
    missing = [n for n in registry._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_priority_has_no_duplicates():
    pri = registry._PRIORITY
    assert len(pri) == len(set(pri))


def _latest_green() -> dict[str, int]:
    """Latest round each query earned a fully-green driver row."""
    latest: dict[str, int] = {}
    for rnd in _rounds():
        for name, rec in _correctness(rnd).items():
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match") is not False
                and not rec.get("err")
            )
            if ok:
                latest[name] = rnd
    return latest


def test_driver_window_contents():
    """The first 50 queries() entries (the driver's correctness window)
    must contain every current-round target: every red/err query from the
    latest driver round (none expected), every query never driver-checked
    (new this round), and the stalest green rows first — nothing already
    fresh may hold a slot while stale rows wait outside. The thresholds
    below self-derive from the CORRECTNESS artifact series, so this test
    starts failing the moment a new driver round lands without a window
    rotation (by design: the rotation is each round's first commit)."""
    names = list(registry.all_queries())
    window = set(names[:50])

    latest = _latest_green()
    never_checked = {n for n in names if n not in latest}
    latest_round = max(_rounds(), default=0)
    last = _correctness(latest_round)
    last_bad = {
        n
        for n, rec in last.items()
        if not (rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"))
    }
    # Rows 4+ rounds stale are unconditionally due (at round 7 this was the
    # r3-and-older set); the window MUST carry them along with every red row
    # and every never-checked registration.
    hard_stale = {n for n, rnd in latest.items() if rnd <= latest_round - 4}

    must_have = last_bad | never_checked | hard_stale
    missing = must_have - window
    assert not missing, f"driver window is missing: {sorted(missing)}"

    # every remaining slot goes to stale rotation: nothing green within the
    # last two rounds may occupy a window slot while 3+-rounds-stale rows wait
    fresh_in_window = {n for n in window if latest.get(n, 0) >= latest_round - 2}
    stale_outside = {n for n, rnd in latest.items() if rnd <= latest_round - 3} - window
    assert not (fresh_in_window and stale_outside), (
        f"window wastes slots on fresh rows {sorted(fresh_in_window)} while "
        f"stale rows wait: {sorted(stale_outside)}"
    )


def test_readme_inventory_matches_registry():
    """README's inventory line is GENERATED (tools/update_inventory.py);
    this gate keeps its query count honest against the live registry (the
    test count is validated by the tool itself at generation time)."""
    readme = pathlib.Path(__file__).resolve().parents[1] / "README.md"
    line = next(
        l for l in readme.read_text().splitlines() if l.startswith("Final inventory:")
    )
    assert "<!-- inventory:auto -->" in line, "inventory line is hand-maintained"
    n = len(registry.all_queries())
    assert f"**{n} queries" in line, (line, n)


def test_bench_artifacts_are_ghost_free():
    """Every query named in the committed bench artifacts must still be
    registered — a renamed/removed query whose old timing lingers would
    silently corrupt tools/bench_gate.py's baseline and the generated
    README tables. The FORWARD direction is enforced for BENCH_FULL.json
    only (r10 VERDICT #2: three round-10 operators shipped with no row in
    any committed quiet bench): every registered query must have a
    BENCH_FULL row, so adding a query obliges a quiet-host re-measure in
    the same round. The sf1/sf10/sf100 artifacts stay backward-only —
    probe scale is a judgment call per operator, and forcing a multi-hour
    sf10 pass per added query would push bench runs onto contended
    hosts, which the bench discipline forbids."""
    names = set(registry.all_queries())
    for art, sf in (
        ("BENCH_FULL.json", 0.1),
        ("BENCH_sf1.json", 1.0),
        # headline probe artifacts feed the README sf10/sf100 tables via
        # tools/update_inventory.py — a renamed query whose probe row
        # lingered would keep a ghost line in the generated tables
        ("BENCH_sf10_headline.json", 10.0),
        ("BENCH_sf100_headline.json", 100.0),
    ):
        data = json.loads(pathlib.Path(art).read_text())
        ghosts = set(data["queries"]) - names
        assert not ghosts, f"{art} times unregistered queries: {sorted(ghosts)}"
        assert data["sf"] == sf, (art, data["sf"])
    full = json.loads(pathlib.Path("BENCH_FULL.json").read_text())
    unbenched = names - set(full["queries"])
    assert not unbenched, (
        f"registered queries missing from BENCH_FULL.json (re-run bench.py "
        f"on a quiet host): {sorted(unbenched)}"
    )


def test_every_query_has_fn_and_oracle():
    qs = registry.all_queries()
    assert len(qs) >= 113
    no_oracle = sorted(n for n, rq in qs.items() if rq.oracle is None)
    assert no_oracle == sorted(_ROWS_ONLY_OK), no_oracle
