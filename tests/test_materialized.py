"""Materialized daily-rollup maintenance: incremental refresh writes only
missing/requested day partitions; untouched partitions stay byte-identical;
the materialized result always equals the direct batch rollup."""

from __future__ import annotations

import glob
import os

from olap_db_spark.operators.events_ts import ts_daily_rollup
from olap_db_spark.operators.materialized import refresh_daily_rollup

SF = "/root/testdata/sf0.001"


def _state(path):
    out = {}
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        st = os.stat(f)
        out[f] = (st.st_mtime, st.st_size)
    return out


def test_refresh_builds_then_noops_then_backfills(spark, tmp_path):
    sink = str(tmp_path / "rollup")
    batch = {r["day"]: r for r in ts_daily_rollup(spark, SF).collect()}

    # initial refresh materializes every day
    written = refresh_daily_rollup(spark, SF, sink)
    assert sorted(written) == sorted(batch)
    got = {r["day"]: r for r in spark.read.parquet(sink).collect()}
    assert got.keys() == batch.keys()
    for d in batch:
        assert got[d]["n_events"] == batch[d]["n_events"]
        assert got[d]["dau"] == batch[d]["dau"]

    # steady state: nothing new → nothing written, files untouched
    before = _state(sink)
    assert refresh_daily_rollup(spark, SF, sink) == []
    assert _state(sink) == before

    # late-data backfill: exactly one day partition is rewritten
    target = sorted(batch)[1]
    written = refresh_daily_rollup(spark, SF, sink, days=[target])
    assert written == [target]
    after = _state(sink)
    changed = {f for f in after if after[f] != before.get(f)}
    assert changed and all(f"day={target}" in f for f in changed)
    # values still equal the batch rollup
    got = {r["day"]: r["n_events"] for r in spark.read.parquet(sink).collect()}
    assert got == {d: r["n_events"] for d, r in batch.items()}
