"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Stricter than the driver: we compare actual values (not hashes), flagging
any float that is not bit-identical — if this passes, any reasonable
hash-compare passes too. Columns are compared by sorted name; rows are
compared order-insensitively.
"""

from __future__ import annotations

import datetime as _dt
import math


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def rows_to_multiset(cols, rows):
    """Rows → sorted list of tuples ordered by sorted column name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_spark_duckdb(sdf, duck, sql, name=""):
    """Assert spark DataFrame result == duckdb result for ``sql``."""
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"[{name}] column mismatch: spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"[{name}] row count mismatch: spark={len(spark_rows)} "
        f"duck={len(duck_rows)}"
    )
    a = rows_to_multiset(spark_cols, spark_rows)
    b = rows_to_multiset(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"[{name}] value mismatch; first diffs: {diffs}")
