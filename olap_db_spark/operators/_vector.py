"""Deterministic vector math over array<float> embedding columns.

Cosine similarity on floats is NOT reproducible across engines if computed
naively (summation order + float32/float64 promotion). We quantize each
element to a fixed-point BIGINT (round(x * 1e6) — the per-element double
product is IEEE-identical in both engines), then dot products and squared
norms are exact integer arithmetic (order-independent), and the final
cosine is one sqrt+multiply+divide on exact inputs — sqrt is IEEE
correctly-rounded, so the result is bit-identical in Spark and DuckDB.

64-dim unit-ish vectors: |q| ≤ ~1e6 per element, products ≤ 1e12, sums ≤
1e14 — comfortably inside BIGINT. At larger dims/scales bump to 1e4
quantization.

All of this stays in whole-stage codegen (higher-order functions on
arrays) — no Python, no UDFs, no data leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def quantize(vec: Column) -> Column:
    """array<float> → array<bigint> fixed-point."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * F.lit(QUANT_SCALE)).cast("long")
    )


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_q(a: Column) -> Column:
    """Exact integer squared norm."""
    return dot_q(a, a)


def cosine_q(dot: Column, n2a: Column, n2b: Column) -> Column:
    """Deterministic cosine from exact integer dot + squared norms."""
    return dot.cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


# --- DuckDB mirrors (identical arithmetic, same op order) --------------------

SQL_QUANTIZE = (
    "list_transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
)
SQL_DOT = "list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]))"


def sql_quantize(v: str) -> str:
    return SQL_QUANTIZE.format(v=v)


def sql_dot(a: str, b: str) -> str:
    return SQL_DOT.format(a=a, b=b)


def sql_cosine(dot: str, n2a: str, n2b: str) -> str:
    return (
        f"CAST({dot} AS DOUBLE) / "
        f"(sqrt(CAST({n2a} AS DOUBLE)) * sqrt(CAST({n2b} AS DOUBLE)))"
    )
