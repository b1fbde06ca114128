"""Order-independent floating-point aggregation helpers.

Shuffle-parallel engines sum doubles in nondeterministic order; the driver
hash-compares Spark output against a DuckDB oracle, so last-ulp drift in a
``SUM(double)`` would flap the comparison. Money-style columns in the
testdata are fixed-point (2 dp) stored as doubles, so we aggregate them
exactly: scale each row to an integer (the per-row double product is
IEEE-deterministic and identical in both engines), round, sum as BIGINT
(order-independent), and perform ONE final double division written
identically in both dialects.

This is also the right call at 100 TB: integer sums never lose precision to
catastrophic cancellation, and the rounding happens map-side inside
whole-stage codegen — zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_long_sum(expr: Column, scale: int) -> Column:
    """SUM(CAST(ROUND(expr * scale) AS BIGINT)) — exact, order-independent."""
    return F.sum(F.round(expr * F.lit(scale)).cast("long"))


def fixed_sum(expr: Column, scale: int) -> Column:
    """Deterministic SUM of a fixed-point-as-double expression.

    DuckDB mirror: ``CAST(SUM(CAST(ROUND((expr) * {scale}, 0) AS BIGINT)) AS
    DOUBLE) / {scale}.0``
    """
    return scaled_long_sum(expr, scale).cast("double") / F.lit(float(scale))


def fixed_avg(expr: Column, scale: int) -> Column:
    """Deterministic AVG of a fixed-point-as-double expression.

    DuckDB mirror: ``(CAST(SUM(CAST(ROUND((expr) * {scale}, 0) AS BIGINT)) AS
    DOUBLE) / COUNT(*)) / {scale}.0``
    """
    return (
        scaled_long_sum(expr, scale).cast("double") / F.count(F.lit(1))
    ) / F.lit(float(scale))


def sql_fixed_sum(expr: str, scale: int) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {scale}.0"
    )


def sql_fixed_avg(expr: str, scale: int) -> str:
    return (
        f"(CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / COUNT(*)) / {scale}.0"
    )
