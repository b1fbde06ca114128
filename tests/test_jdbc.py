"""Live JDBC round-trip (A5) via the Derby engine embedded in Spark's own
classpath — no external database needed: ``jdbc:derby:memory:`` lives in
the test JVM, and in local mode executor threads share it.

Proves the reference's Postgres paging pattern end-to-end
(/root/reference/rankings_generator.py:117-129: filtered + ordered +
paged SQL pushed INTO the database) instead of the round-1
"configured-but-never-.load()ed" reader.
"""

from __future__ import annotations

import pytest

from olap_db_spark.sources.readers import jdbc_reader

_URL = "jdbc:derby:memory:olapjdbc;create=true"
_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_table(spark):
    """Seed a Derby table from a DataFrame through the JDBC WRITER —
    the write half of the round trip."""
    df = spark.createDataFrame(
        [(i, f"term_{i % 7}", (i * 37) % 100) for i in range(1, 201)],
        "id INT, term STRING, rank INT",
    )
    (
        df.write.format("jdbc")
        .option("url", _URL)
        .option("driver", _DRIVER)
        .option("dbtable", "rankings")
        .mode("overwrite")
        .save()
    )
    return "rankings"


def test_jdbc_pushdown_paged_read(spark, jdbc_table):
    """The reference's page query (WHERE + ORDER BY + OFFSET/FETCH) runs
    INSIDE the database via the query option; Spark sees only the page."""
    page = jdbc_reader(
        spark,
        _URL,
        # Spark's JDBC writer creates quoted (case-sensitive) identifiers,
        # so the pushed SQL must quote them too.
        'SELECT "id", "term", "rank" FROM rankings WHERE "rank" >= 50 '
        'ORDER BY "rank", "id" OFFSET 10 ROWS FETCH NEXT 20 ROWS ONLY',
    ).option("driver", _DRIVER).load()
    rows = page.collect()
    assert len(rows) == 20
    assert all(r["rank"] >= 50 for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks)


def test_jdbc_filter_pushdown_in_plan(spark, jdbc_table):
    """A DataFrame filter over a dbtable read is pushed to the database —
    PushedFilters visible in the executed plan."""
    from pyspark.sql import functions as F

    df = (
        spark.read.format("jdbc")
        .option("url", _URL)
        .option("driver", _DRIVER)
        .option("dbtable", "rankings")
        .load()
        .filter(F.col("rank") > 90)
        .select("id", "rank")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "rank" in plan.lower()
    assert all(r["rank"] > 90 for r in df.collect())


def test_jdbc_partitioned_read(spark, jdbc_table):
    """Partition-column split: N parallel range queries, one per executor
    slot — the scale replacement for client-side LIMIT/OFFSET paging."""
    df = (
        spark.read.format("jdbc")
        .option("url", _URL)
        .option("driver", _DRIVER)
        .option("dbtable", "rankings")
        .option("partitionColumn", "id")
        .option("numPartitions", 4)
        .option("lowerBound", 1)
        .option("upperBound", 201)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
