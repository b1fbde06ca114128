"""Reference-semantics tests on rankings-shaped data (SURVEY.md §5.2):
the reference's own computations, end-to-end on the synthetic generator's
output — generation → normalization → the queries its schema exists for.

Covers: url_bone over generated URLs (A25), null-skip filter (A17),
best-rank-per-(domain,date) & top-3-per-term (A39 semantics,
/root/reference/s3_rankings_collector.py:88), paged fetch equivalence
(A36–A38, /root/reference/rankings_generator.py:117-129)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from olap_db_spark.functions.urls import url_bone
from olap_db_spark.sources.generator import generate_rankings


def _rankings(spark, n=5000):
    return generate_rankings(spark, n, n_partitions=4)


def test_url_bone_over_generated_urls(spark):
    df = _rankings(spark).withColumn("bone", url_bone(F.col("url")))
    rows = df.select("domain", "url", "bone").limit(200).collect()
    for r in rows:
        # generator builds https://www.{domain}/p/{id} → bone strips scheme+www
        assert r["bone"].startswith(r["domain"] + "/p/"), (r["url"], r["bone"])
        assert not r["bone"].startswith("http")


def test_null_skip_filter(spark):
    # A17: skip rows where url or rank missing (reference drops them
    # before insert, rankings_generator.py:158-162)
    df = _rankings(spark, 1000).withColumn(
        "url", F.when(F.col("rank") % 7 == 0, None).otherwise(F.col("url"))
    )
    kept = df.filter(F.col("url").isNotNull() & F.col("rank").isNotNull())
    assert kept.count() == df.count() - df.filter(F.col("rank") % 7 == 0).count()
    assert kept.filter(F.col("url").isNull()).count() == 0


def test_best_rank_per_domain_date_top3_per_term(spark):
    df = _rankings(spark)
    # best (lowest) rank per (domain, date) — the fact table's headline agg
    best = df.groupBy("domain", "date").agg(F.min("rank").alias("best_rank"))
    assert best.filter(F.col("best_rank") < 1).count() == 0
    joined = df.join(best, ["domain", "date"])
    assert joined.filter(F.col("rank") < F.col("best_rank")).count() == 0

    # top-3 per term by volume (the reference's s3_keys[:3] shape)
    w = Window.partitionBy("term").orderBy(F.col("volume").desc(), F.col("url"))
    top3 = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    sizes = top3.groupBy("term").count().collect()
    assert all(r["count"] <= 3 for r in sizes)
    # every kept row's volume >= the term's 4th-highest volume
    w4 = Window.partitionBy("term").orderBy(F.col("volume").desc(), F.col("url"))
    ranked = df.withColumn("rn", F.row_number().over(w4))
    fourth = ranked.filter(F.col("rn") == 4).select(
        "term", F.col("volume").alias("v4")
    )
    viol = (
        top3.join(fourth, "term")
        .filter(F.col("volume") < F.col("v4"))
        .count()
    )
    assert viol == 0


def test_paged_fetch_equivalence(spark):
    """LIMIT/OFFSET pages, concatenated, equal the full ordered scan —
    the reference's paged drain loop (A40) collapses to one query."""
    df = _rankings(spark, 1000).withColumn(
        "row_key", F.concat_ws("|", "term", "url", "rank")
    )
    ordered = df.orderBy("volume", "row_key").select("row_key")
    full = [r["row_key"] for r in ordered.collect()]
    paged = []
    page_size = 300
    for page in range(4):
        chunk = ordered.offset(page * page_size).limit(page_size).collect()
        paged.extend(r["row_key"] for r in chunk)
    assert paged == full
