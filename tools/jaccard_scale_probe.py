"""r13 (r12 VERDICT #3): re-measure _jaccard_pairs' two candidate shapes
at scale. The in-array form (ObjectHashAggregate(collect_list) + pair
generation inside the array) won at sf0.1 (2.77 vs 3.66 s), but each
shingle group materializes in ONE task — the O(Σ group²) term and the
group-concentration risk only show past the first decade. This probe
times both shapes over the SAME shingled corpus in one session,
interleaved, and asserts output equality first.

Usage: python tools/jaccard_scale_probe.py <sf_dir> <rounds>
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def self_join_pairs(sh):
    """The r12 dead-end reformulation, reconstructed: distinct occurrence
    table joined to itself on the capped shingle; every group's pair work
    spreads over the join's hash partitions instead of one task."""
    from olap_db_spark.operators.fuzzy_dedup import _FREQ_CAP

    exploded = sh.select(
        "doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("sh")
    )
    kept = exploded.join(
        exploded.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _FREQ_CAP))
        .select("sh"),
        "sh",
    )
    a = kept.select(
        "sh", F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    b = kept.select(
        "sh", F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "na", "doc_b", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    from pyspark.sql import SparkSession

    from olap_db_spark.operators.fuzzy_dedup import (
        _dup_corpus,
        _jaccard_pairs,
        _shingled,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("jaccard-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def in_array():
        return _jaccard_pairs(_shingled(_dup_corpus(spark, sf_dir)))

    def joined():
        return self_join_pairs(_shingled(_dup_corpus(spark, sf_dir)))

    eq = sorted(map(tuple, in_array().collect())) == sorted(
        map(tuple, joined().collect())
    )
    print(f"outputs equal: {eq}", flush=True)
    assert eq

    # skew profile: max group size vs the cap (the quantity that decides
    # whether one collect_list task can concentrate O(cap^2) work)
    ex = _shingled(_dup_corpus(spark, sf_dir)).select(
        F.explode("shingles").alias("sh")
    )
    prof = (
        ex.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.max("df").alias("max_df"),
            F.expr("percentile_approx(df, 0.999)").alias("p999"),
            F.count(F.lit(1)).alias("n_groups"),
        )
        .collect()[0]
    )
    print(
        f"group profile: max_df={prof['max_df']} p999={prof['p999']} "
        f"groups={prof['n_groups']}",
        flush=True,
    )

    runs = {"in_array": [], "self_join": []}
    for _ in range(rounds):
        for name, fn in (("in_array", in_array), ("self_join", joined)):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in runs.items():
        print(f"{name}: median {statistics.median(ts):.3f} runs {ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
