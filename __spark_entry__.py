"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``olap_db_spark.registry``: every implemented operator from
SURVEY.md §2 registers there as a named query with (when SQL-expressible) a
DuckDB oracle. The driver's verify runs ``entry(spark)`` as a smoke check,
runs each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from olap_db_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-shaped top-revenue orders) on sf0.001."""
    from olap_db_spark.operators.analytics import q3_top_revenue_orders

    return q3_top_revenue_orders(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; see olap_db_spark/operators/."""
    return registry.query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return registry.oracle_sqls()
