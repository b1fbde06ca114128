"""Scale-probe runner: time a list of registered queries at a given
.scaledata dir and write the headline artifact — one quiet sequential
pass on the final plans, ONE FRESH SESSION PER ROW (each row runs in its
own subprocess), so BENCH_sf10_headline.json / BENCH_sf100_headline.json
are like-for-like in the sense that actually matters: no row's number
depends on which rows ran before it (r8 VERDICT item 6).

Why per-row sessions and not one shared session: the output-bound dedup
rows leave ~tens of GB of shuffle files at sf10+, and a row that follows
them in the same session reads 2-4x its fresh-session time
(scale_salted_skew_join: 70.8 s late in a shared session, 16.8 s fresh)
— clearCache() plus forced ContextCleaner GC recovers most rows but not
the ones right behind a 300-s shuffle monster. A shared-session total
makes row order a hidden variable; per-row sessions at the same code,
same data, same quiet host make every number independently
reproducible, and the total is still one sequential pass.

Usage:
    python tools/run_scale_probe.py <sf_dir> <out.json> <sf_label> \
        [--note "..."] name [name ...]

Names are registry names; the sampled-eval variants take a probe-scale
setting suffix (vector evals ``sim_ivf_eval_sampled@25`` = hash-rank K;
``dedup_lsh_eval_sampled@64`` = pair-coin modulus) and are recorded
under the bare name with the setting in the artifact note.

Protocol (memory: bench noise discipline): quiet host, nothing else
running; per row, one warmup action on its fresh session before the
timed fn()+noop-sink save (eager-fixpoint operators do work at call
time, so both are timed together).
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

        # DOC-level coin (a pair survives iff either endpoint lands 0):
        # _lsh_eval_df pushes it into pair GENERATION on both routes, so
        # the unsampled candidate set is never materialized.
        def pred(d):
            return _md5_coin(_EVAL_COIN_PREFIX, d, mod) == 0

        return lambda spark, sf: _lsh_eval_df(spark, sf, pred)
    raise SystemExit(f"no probe-scale variant for {base!r}")


def _run_one(sf_dir: str, name: str, twice: bool = False) -> None:
    """Worker mode: time one query on a fresh session, print one line.
    ``twice`` re-times the query in the same session after the cold run
    (``##WARM`` line) — for index-backed queries the second call hits the
    freshness gate and serves from the standing index, so cold vs warm IS
    the amortization the index buys (r11 VERDICT #3)."""
    from pyspark.sql import SparkSession

    from olap_db_spark.registry import query_fns

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .appName(f"scale-probe-{name}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "@" in name:
        base, setting = name.split("@", 1)
        fn = _sampled_fn(base, int(setting))
    else:
        fn = query_fns()[name]
    # warmup: one tiny action so JVM/codegen startup never lands inside
    # the timed row
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"##RESULT {name.split('@')[0]} {time.time() - t0:.3f}", flush=True)
    if twice:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"##WARM {name.split('@')[0]} {time.time() - t0:.3f}", flush=True)


def main() -> None:
    import subprocess

    args = sys.argv[1:]
    if args and args[0] == "--worker":
        twice = "--twice" in args
        _run_one(args[1], args[2], twice=twice)
        return
    sf_dir, out_path, sf_label = args[0], args[1], float(args[2])
    args = args[3:]
    note = ""
    append = False
    warm_names: set[str] = set()
    # flags accept any order ahead of the name list
    while args and args[0].startswith("--"):
        if args[0] == "--note":
            note, args = args[1], args[2:]
        elif args[0] == "--append":
            # merge new rows into the existing artifact instead of
            # replacing it — late additions (r11 VERDICT #3) re-probe only
            # themselves, never forcing a re-run of settled rows
            append, args = True, args[1:]
        elif args[0] == "--warm":
            warm_names, args = set(args[1].split(",")), args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    names = args
    if not names:
        raise SystemExit("no query names given")
    # timings are keyed by BARE name (the README tables join on it) —
    # two settings of one query in a single run would silently overwrite
    # each other's row, so reject that up front
    bare_names = [n.split("@")[0] for n in names]
    dups = sorted({b for b in bare_names if bare_names.count(b) > 1})
    if dups:
        raise SystemExit(
            f"duplicate bare query names in one probe run: {dups} — "
            "run each setting as its own probe artifact"
        )

    timings: dict[str, float] = {}
    warms: dict[str, float] = {}
    for name in names:
        cmd = [sys.executable, __file__, "--worker", sf_dir, name]
        if name.split("@")[0] in warm_names:
            cmd.append("--twice")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("##RESULT ")),
            None,
        )
        if proc.returncode != 0 or line is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"probe row {name} failed (rc={proc.returncode})")
        _, bare, sec = line.split()
        timings[bare] = round(float(sec), 3)
        wline = next(
            (l for l in proc.stdout.splitlines() if l.startswith("##WARM ")),
            None,
        )
        if wline is not None:
            warms[bare] = round(float(wline.split()[2]), 3)
        warm_note = f" (warm {warms[bare]:.1f} s)" if bare in warms else ""
        print(f"{bare}: {timings[bare]:.1f} s{warm_note}", flush=True)

    if append:
        artifact = json.loads(Path(out_path).read_text())
        artifact["queries"].update(timings)
        artifact["warm"] = {**artifact.get("warm", {}), **warms}
        artifact["total_sec"] = round(sum(artifact["queries"].values()), 1)
        if note:
            artifact["note"] = (artifact.get("note", "") + " " + note).strip()
    else:
        artifact = {
            "sf": sf_label,
            "n_runs": 1,
            "total_sec": round(sum(timings.values()), 1),
            "note": note,
            "queries": timings,
        }
        if warms:
            artifact["warm"] = warms
    if not artifact.get("warm"):
        artifact.pop("warm", None)
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {out_path}: total {artifact['total_sec']} s")


if __name__ == "__main__":
    main()
