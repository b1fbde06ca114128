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
    "olap_db_spark.operators.arg_aggregates",
    "olap_db_spark.operators.relevance",
    "olap_db_spark.operators.sketches",
    "olap_db_spark.operators.analytics_tpch",
    "olap_db_spark.operators.graph",
)


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB-runnable ANSI SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, RegisteredQuery] = {}
_LOADED = False

# Driver-facing ordering. The driver evaluates exactly the first 50 entries
# of ``queries()`` in registration order, so ordering controls which queries
# earn a CORRECTNESS row each round. Names listed here come first (in this
# order); everything else follows in registration order.
#
_PRIORITY: tuple[str, ...] = (
    # ROUND-6 WINDOW (first 50 reach the driver).
    # Tier 1 — repaired driver reds/errs (r5): the four HUGEINT-oracle
    # hash-reds (uncast integer SUMs, see tests/test_oracle_types.py)
    # and the two no_oracle errs, now integer-quantized + oracled.
    "pipeline_corpus_curation",
    "text_bigram_lm_nll",
    "q11_important_stock",
    "q12_priority_lateness",
    "text_bm25_topk",
    "text_bigram_nll_topk",
    # Tier 2 — green r4/r5 but code changed this round (SemDeDup auto-k +
    # block cap; repetition-stats 2-token guard; kmeans module refactor;
    # wavg FLOOR(l_quantity) symmetry fix)
    "dedup_semantic",
    "text_repetition_stats",
    "sim_ivf_kmeans",
    "agg_weighted_avg_pandas",
    # Tier 3 — NEW in round 6, never driver-checked
    "text_hybrid_rrf",
    "dedup_span_exact",
    "graph_pagerank_purchases",
    "text_domain_kl",
    "agg_hll_intersect",
    # Tier 4 — stale-green rotation (driver row age r3). The r3-stale
    # queries that do NOT fit this round roll to round 7:
    # agg_quantiles, agg_rollup, func_date_family, func_explode_wordcount,
    # func_split_key_epoch, func_string_family, func_url_normalize,
    # window_lag_lead, window_ranking, window_running_sum,
    # mm_decode_resize_stats
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q4_priority_exists",
    "q17_small_qty_revenue",
    "join_inner_chain",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_nonequi_band",
    "agg_count_distinct",
    "agg_collect_set",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    "setop_except_all",
    "setop_intersect_all",
    "dedup_distinct",
    "dedup_keep_first",
    "page_sort_limit",
    "page_limit_offset",
    "page_keyset",
    "page_topk_per_group",
    "page_filtered_sorted",
    "func_conditional",
    "func_array_ops",
    "meta_show_databases",
    "meta_show_create_table",
    "agg_cube",
    "agg_grouping_id",
    "agg_grouping_sets",
)


def _ordered(names: list[str]) -> list[str]:
    """Priority names first (priority order), then the rest (registration order)."""
    pri = [n for n in _PRIORITY if n in names]
    rest = [n for n in names if n not in _PRIORITY]
    return pri + rest


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
    return {name: _REGISTRY[name] for name in _ordered(list(_REGISTRY))}


def query_fns() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: rq.oracle for name, rq in all_queries().items() if rq.oracle is not None
    }
