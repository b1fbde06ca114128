"""Bucketed co-located join: both sides bucketed on the join key →
SortMergeJoin with NO shuffle exchange on either side. The 100 TB pattern
for repeatedly-joined fact tables (SURVEY.md §7.0 scale stance)."""

from __future__ import annotations

import pyspark.sql.functions as F

from olap_db_spark.catalog import load

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load(spark, SF, "orders")
    lineitem = load(spark, SF, "lineitem")

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS bucketdb.{name}")
        (
            df.write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(f"bucketdb.{name}")
        )

    a = spark.table("bucketdb.b_orders")
    b = spark.table("bucketdb.b_lineitem")
    # tiny test tables would broadcast, bypassing the bucketed path; at
    # real scale neither side fits the broadcast threshold
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: the join itself must not introduce a shuffle on either side
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:500]
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # and produce correct results
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        want = {
            r["o_orderstatus"]: r["n"]
            for r in orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bucketdb.b_orders")
        spark.sql("DROP TABLE IF EXISTS bucketdb.b_lineitem")
