"""End-to-end through the user facade: the reference's whole lifecycle —
generate → CSV (its interchange format) → typed read → normalize →
partitioned parquet → SQL analytics — on this engine."""

from __future__ import annotations

import pyspark.sql.functions as F

from olap_db_spark.api import OlapEngine
from olap_db_spark.functions.urls import url_bone
from olap_db_spark.sources.generator import generate_rankings
from olap_db_spark.sources.readers import read_rankings_csv

SF = "/root/testdata/sf0.001"


def test_engine_facade(spark):
    eng = OlapEngine(SF, spark=spark)
    assert eng.is_alive()
    assert "lineitem" in eng.tables()
    # SQL surface over the registered catalog
    n = eng.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert n == 6000
    top = eng.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        GROUP BY l_returnflag ORDER BY n DESC LIMIT 1
        """
    ).collect()[0]
    assert top["n"] > 0
    # DataFrame surface
    assert eng.table("region").count() == 5


def test_full_ingest_pipeline(spark, tmp_path):
    """generate → CSV → typed read → url_bone normalize → partitioned
    parquet → analytical query; re-ingest is a no-op."""
    eng = OlapEngine(SF, spark=spark)
    raw = generate_rankings(spark, 2000, n_partitions=4)
    csv_dir = str(tmp_path / "csv")
    raw.write.mode("overwrite").option("header", True).csv(csv_dir)

    typed = read_rankings_csv(spark, csv_dir)
    assert typed.schema.simpleString() == raw.schema.simpleString()
    normalized = typed.withColumn("url_bone", url_bone(F.col("url")))

    table, log = str(tmp_path / "rankings"), str(tmp_path / "log")
    assert eng.ingest(normalized, table, log, "chunk-0") is True
    assert eng.ingest(normalized, table, log, "chunk-0") is False  # replay
    stored = spark.read.parquet(table)
    assert stored.count() == 2000

    # the analytical query the schema exists for: best rank per domain/date
    best = (
        stored.groupBy("domain", "date")
        .agg(F.min("rank").alias("best_rank"), F.sum("volume").alias("vol"))
    )
    assert best.count() > 0
    assert best.filter(F.col("best_rank") < 1).count() == 0


def test_engine_sql_delete_from(spark, tmp_path):
    """DELETE FROM '<path>' PARTITION BY p WHERE ... routes to the
    partition-scoped delete: matching rows gone, empty partitions
    dropped, result lists rewritten partitions."""
    from olap_db_spark.api import OlapEngine

    eng = OlapEngine("/root/testdata/sf0.001", spark)
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 10, "drop"), (1, 11, "keep"), (2, 20, "drop")],
        "day int, id int, tag string",
    ).write.partitionBy("day").parquet(path)
    res = eng.sql(
        f"DELETE FROM '{path}' PARTITION BY day WHERE tag = 'drop'"
    ).collect()
    assert sorted(r[0] for r in res) == ["1", "2"]
    left = sorted((r["day"], r["id"]) for r in spark.read.parquet(path).collect())
    assert left == [(1, 11)]
