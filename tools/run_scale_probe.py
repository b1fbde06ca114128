"""Single-session scale-probe runner: time a list of registered queries
(one pass each, after a session warmup) at a given .scaledata dir and
write the headline artifact — so BENCH_sf10_headline.json /
BENCH_sf100_headline.json totals are like-for-like numbers from ONE
quiet session on the final plans, not sums over rows probed in different
sessions (r8 VERDICT item 6).

Usage:
    python tools/run_scale_probe.py <sf_dir> <out.json> <sf_label> \
        [--note "..."] name [name ...]

Names are registry names; the sampled-eval variants accept a probe-scale
coin modulus suffix (``sim_ivf_eval_sampled@2048``) and are recorded
under the bare name — the per-scale modulus is the sampled evals' design
(hold the query COUNT roughly constant as the corpus grows) and is
recorded in the artifact note.

Protocol (memory: bench noise discipline): quiet host, nothing else
running; one warmup action on the session before the first timed row;
fn() + noop-sink save timed together (eager-fixpoint operators do work
at call time).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sampled_fn(base: str, mod: int):
    # vector evals: @K = hash-rank query-set size; doc-pair eval: @mod =
    # coin modulus (constant pair fraction over a production-blocked
    # truth route — no quadratic risk there)
    if base == "sim_ivf_eval_sampled":
        from olap_db_spark.operators.similarity import _ivf_eval_df

        return lambda spark, sf: _ivf_eval_df(spark, sf, query_k=mod)
    if base == "sim_pq_eval_sampled":
        from olap_db_spark.operators.similarity import _pq_eval_df

        return lambda spark, sf: _pq_eval_df(spark, sf, query_k=mod)
    if base == "dedup_lsh_eval_sampled":
        from olap_db_spark.operators.data_selection import _md5_coin
        from olap_db_spark.operators.fuzzy_dedup import (
            _EVAL_COIN_PREFIX,
            _lsh_eval_df,
        )

        def pred(a, b):
            return (_md5_coin(_EVAL_COIN_PREFIX, a, mod) == 0) | (
                _md5_coin(_EVAL_COIN_PREFIX, b, mod) == 0
            )

        return lambda spark, sf: _lsh_eval_df(spark, sf, pred)
    raise SystemExit(f"no probe-scale variant for {base!r}")


def main() -> None:
    args = sys.argv[1:]
    sf_dir, out_path, sf_label = args[0], args[1], float(args[2])
    args = args[3:]
    note = ""
    if args and args[0] == "--note":
        note, args = args[1], args[2:]
    names = args
    if not names:
        raise SystemExit("no query names given")

    from pyspark.sql import SparkSession

    from olap_db_spark.registry import query_fns

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_fns()

    resolved = []
    for name in names:
        if "@" in name:
            base, mod = name.split("@", 1)
            resolved.append((base, _sampled_fn(base, int(mod))))
        else:
            resolved.append((name, fns[name]))

    # session warmup: one tiny action so JVM/codegen startup never lands
    # inside the first timed row
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in resolved:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]:.1f} s", flush=True)

    artifact = {
        "sf": sf_label,
        "n_runs": 1,
        "total_sec": round(sum(timings.values()), 1),
        "note": note,
        "queries": timings,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {out_path}: total {artifact['total_sec']} s")


if __name__ == "__main__":
    main()
