"""applyInPandasWithState operator vs the batch ground truth."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from olap_db_spark.catalog import load
from olap_db_spark.streaming.stateful import user_activity_tracker
from olap_db_spark.streaming.windows import run_available_now, stream_events

SF = "/root/testdata/sf0.001"


def test_stateful_tracker_matches_batch(spark, tmp_path):
    d = tmp_path / "estream"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "p.parquet")
    rows = run_available_now(
        user_activity_tracker(stream_events(spark, str(d))),
        "t_tracker",
        "update",
    )
    # update mode re-emits per batch; keep the final row per user
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value_cents"])

    batch = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    want = {r["user_id"]: (r["n"], r["cents"]) for r in batch.collect()}
    assert set(final) == set(want)
    mismatches = {u: (final[u], want[u]) for u in want if final[u] != want[u]}
    assert not mismatches, dict(list(mismatches.items())[:3])
