"""The big gate: every registered oracle-checked query must match DuckDB
bit-for-bit at sf0.01 — a strict local mirror of the driver's t2 check."""

from __future__ import annotations

import pytest

from olap_db_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_spark_duckdb

ALL = registry.all_queries()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_runs(spark, name):
    """Every query (oracle or not) runs at sf0.001 and has a stable schema."""
    df = ALL[name].fn(spark, "/root/testdata/sf0.001")
    assert df.columns, name
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name", sorted(n for n, q in ALL.items() if q.oracle is not None)
)
def test_oracle_parity(spark, duck, name):
    rq = ALL[name]
    sdf = rq.fn(spark, SF_ORACLE)
    compare_spark_duckdb(sdf, duck, rq.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))
