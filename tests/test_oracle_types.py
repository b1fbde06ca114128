"""Oracle result-type portability gate.

Round-6 root-cause of every driver hash-red (r4 AND r5): DuckDB's
``SUM(INTEGER)``/``SUM(BIGINT)`` returns HUGEINT (int128), and the driver's
fetch path coerces HUGEINT lossily (arrow/pandas render it as float64), so
any oracle emitting a HUGEINT column hash-mismatches DETERMINISTICALLY —
regardless of data — while a ``fetchall()``-based local simulation passes.
The correlation was exact: all 4 r5 hash-red queries (and only those) had
uncast integer SUMs.

This gate runs every registered oracle in DuckDB at sf0.001 and rejects
result columns whose type is not in the portable set. It is pure DuckDB —
no SparkSession — so it runs in seconds and belongs in every CI pass.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Types that round-trip exactly through every DuckDB fetch path (fetchall,
# arrow, pandas) AND match a Spark result column bit-for-bit. Notably
# absent: HUGEINT/UHUGEINT (float64 through arrow), TIMESTAMP* (session-
# timezone dependent — the driver contract requires casting to date/epoch/
# string), DECIMAL (scale/precision render differently per engine), TIME.
_PORTABLE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracles():
    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_result_types_portable(con, name, sql):
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in _PORTABLE and not str(t).startswith("VARCHAR")
    ]
    assert not bad, (
        f"oracle {name!r} emits non-portable column types {bad}; "
        "CAST integer SUMs to BIGINT (DuckDB SUM yields HUGEINT) and never "
        "return raw timestamps/decimals — the driver's fetch path coerces "
        "them lossily and the query goes deterministically hash-red"
    )


def test_every_query_has_an_oracle():
    """Round-5 lesson: the driver records ``err: no_oracle`` for any
    ``queries()`` entry missing from ``oracle_sql()`` — rows-only
    registration is not part of the driver contract."""
    missing = sorted(set(entry.queries()) - set(entry.oracle_sql()))
    assert not missing, f"queries without oracle (driver will err): {missing}"
