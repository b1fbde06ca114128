"""Query registry: the single source of truth for the driver contract.

Every operator the engine claims (SURVEY.md §2) registers here as a named
query ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a DuckDB
oracle SQL string computing the identical result on the same parquet tables.
``__spark_entry__`` is a thin view over this registry.

Determinism contract (applies to every oracle-checked query):
- every computed column is aliased identically in Spark and SQL;
- floating-point aggregates use order-independent integer arithmetic
  (see ``operators._determinism``) so the value hash is bit-stable;
- LIMIT queries carry a total order (unique tie-break column).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that self-register queries on import.
_QUERY_MODULES = (
    "olap_db_spark.operators.analytics",
    "olap_db_spark.operators.joins",
    "olap_db_spark.operators.aggregates",
    "olap_db_spark.operators.windows",
    "olap_db_spark.operators.setops",
    "olap_db_spark.operators.dedup",
    "olap_db_spark.operators.pagination",
    "olap_db_spark.operators.scalar_funcs",
    "olap_db_spark.operators.events_ts",
    "olap_db_spark.operators.text_analysis",
    "olap_db_spark.operators.fuzzy_dedup",
    "olap_db_spark.operators.similarity",
    "olap_db_spark.operators.multimodal_ops",
    "olap_db_spark.operators.metadata_ops",
    "olap_db_spark.operators.scale_techniques",
    "olap_db_spark.operators.kmeans",
)


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB-runnable ANSI SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, RegisteredQuery] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as a named engine query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_queries() -> dict[str, RegisteredQuery]:
    _load()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: rq.oracle for name, rq in all_queries().items() if rq.oracle is not None
    }
