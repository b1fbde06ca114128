"""Broadcast-disabled parity sweep (r9 verdict ask #3).

Commit 3bc6fe5 documented a real Spark 4.1 planner hazard: when a
semi-join over ``_dup_corpus``'s union compiles to sort-merge instead of
broadcast, the optimizer can push it into the union's branches and then
wrongly treat the concatenated union as hash-partitioned, skipping a
required exchange — a crash at best, silent duplicate/missing rows at
worst. The hazard is INVISIBLE under the default config because the
tiny-side joins all broadcast at test scale. This sweep re-runs DuckDB
oracle parity for the whole dedup family (every consumer of the
``_dup_corpus`` union and the LSH/jaccard pair routes) with
``spark.sql.autoBroadcastJoinThreshold=-1``, so every equi-join takes
the sort-merge path a large cluster would take on real data sizes.

sf0.001 keeps the sweep cheap; the hazard is a plan-shape property, not
a data-size one (the 3bc6fe5 regression reproduced at sf0.001 with the
threshold disabled).

Round 11 (r10 VERDICT stretch b): the sweep covers the FULL registry,
not just the dedup family — every oracled query re-proves parity under
the sort-merge plans a large cluster would take, closing the 3bc6fe5
hazard class everywhere. Explicit ``F.broadcast()`` hints still
broadcast (the hint overrides the threshold), so what flips is exactly
the set of implicit broadcasts — the set that flips in production when
dimension tables outgrow the threshold.
"""

from __future__ import annotations

import pytest

from olap_db_spark import registry
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_spark_duckdb

ALL = registry.all_queries()

# Every oracled query in the registry (r11: extended from the dedup
# family — the original hazard class's home — to everything).
_SWEEP = sorted(n for n, q in ALL.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck_smoke():
    """DuckDB views over the SAME sf as the Spark side of this sweep."""
    import duckdb

    from olap_db_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark_smj(spark):
    """Session-shared Spark with broadcast joins disabled for the module."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize("name", _SWEEP)
def test_smj_oracle_parity(spark_smj, duck_smoke, name):
    rq = ALL[name]
    sdf = rq.fn(spark_smj, SF_SMOKE)
    compare_spark_duckdb(sdf, duck_smoke, rq.oracle, name=f"{name}[smj]")
