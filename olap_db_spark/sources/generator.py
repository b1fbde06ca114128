"""Synthetic rankings generator — the reference's Faker row synthesis
(A7, A30–A32: /root/reference/random_data_generator.py:13-45) as a
DataFrame program: ``spark.range(n)`` + column expressions. No driver-side
loops, no Python row objects — 5B rows (the reference's design target,
SURVEY.md §6) is a partition count, not a memory problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference generates 4 fixed domains (/root/reference/random_data_generator.py:21-22)
DOMAINS = ("casino.org", "bonusfinder.com", "gambling.com", "vegasslotsonline.com")
TERMS = ("casino apps", "best slots", "online poker", "iphone casino", "free spins")


def generate_rankings(
    spark: SparkSession, n_rows: int, seed: int = 42, n_partitions: int | None = None
) -> DataFrame:
    """rankings_v1-shaped synthetic rows (domain, date, term, url, rank,
    volume, cpc) with the reference's value domains:
    rank 1–100, volume 10–50M step 10, cpc 0–10 2dp, date in [today−360d,
    today] (/root/reference/random_data_generator.py:28-37)."""
    df = spark.range(0, n_rows, numPartitions=n_partitions)
    pick = lambda arr, expr: F.element_at(  # noqa: E731
        F.array(*[F.lit(x) for x in arr]), (expr % len(arr) + 1).cast("int")
    )
    domain = pick(DOMAINS, F.col("id"))
    term = pick(TERMS, F.col("id") * 7 + 3)
    r = lambda s: F.rand(seed + s)  # noqa: E731
    return df.select(
        domain.alias("domain"),
        F.date_sub(F.current_date(), (r(1) * 360).cast("int")).alias("date"),
        term.alias("term"),
        F.concat(
            F.lit("https://www."), domain, F.lit("/p/"), F.col("id").cast("string")
        ).alias("url"),
        ((r(2) * 100).cast("int") + 1).alias("rank"),
        (((r(3) * 4_999_999).cast("long") + 1) * 10).alias("volume"),
        (F.round(r(4) * 1000) / 100.0).alias("cpc"),
    )
