#!/usr/bin/env python
"""Same-session interleaved A/B timing for registered queries.

Usage:
    python tools/ab_time.py ROUNDS name [name ...]

Times each named query ROUNDS times in interleaved full-set rounds
(ambient noise lands on different queries each round), with the bench
harness's ambient canaries before/after, and prints per-query medians.
Run once on the pre-change tree and once on the post-change tree in the
SAME quiet window — or put old/new variants side by side via
$AB_MODULE (a module exposing VARIANTS: dict[name, fn(spark, sf_dir)]),
which is timed INTERLEAVED with the registered queries so host drift
divides out of the comparison.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from olap_db_spark import registry  # noqa: E402
from olap_db_spark.session import get_spark  # noqa: E402
from bench import ambient_canary, run_query  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    fns: dict[str, object] = {n: qs[n].fn for n in names}
    mod_name = os.environ.get("AB_MODULE")
    if mod_name:
        mod = importlib.import_module(mod_name)
        for k, fn in mod.VARIANTS.items():
            fns[k] = fn
    # Adjacency: run "old:x" / "new:x" / "x" back-to-back within each round
    # so a decaying host-contention wave hits both sides of a comparison
    # equally (a first cut ran all new entries before all old ones and a
    # mid-round wave poisoned only the new side's samples).
    fns = dict(
        sorted(fns.items(), key=lambda kv: (kv[0].split(":")[-1], kv[0]))
    )
    # warm-up
    run_query(qs["q1_pricing_summary"].fn(spark, sf_dir))
    pre = ambient_canary(spark)
    runs: dict[str, list[float]] = {n: [] for n in fns}
    for _ in range(rounds):
        for n, fn in fns.items():
            spark.sparkContext.setJobDescription(f"ab:{n}")
            t0 = time.perf_counter()
            run_query(fn(spark, sf_dir))
            runs[n].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    post = ambient_canary(spark)
    out = {
        "ambient_pre": pre,
        "ambient_post": post,
        "medians": {n: round(statistics.median(ts), 3) for n, ts in runs.items()},
        "runs": runs,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
