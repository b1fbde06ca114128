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
    "olap_db_spark.operators.data_selection",
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
    # ROUND-9 WINDOW (first 50 reach the driver) — stale-row rotation.
    # Round 8 went 50/50 green (the third consecutive fully-green round),
    # so this window executes the r8 VERDICT's #1 ask: the 7 rows whose
    # latest driver green is round 5 (they deferred past slot 50 last
    # round and are now hard-stale), then 43 of the 50 rows whose latest
    # green is round 6. Ordered so the most defer-tolerant rows sit last —
    # they are the ones displaced past slot 50 as new round-9 queries
    # claim never-checked slots at the top of the tuple.
    #
    # Tier 0 — NEW in round 9, never driver-checked (each displaces one
    # tier-2 row past slot 50): the sampled-truth-set eval variants.
    "sim_ivf_eval_sampled",
    "sim_pq_eval_sampled",
    "dedup_lsh_eval_sampled",
    # Tier 1 — the 7 rows whose latest green is round 5 (hard-stale).
    "ts_user_lifetime",
    "mm_binary_features",
    "func_math_family",
    "meta_select_one",
    "sample_bernoulli",
    "sample_stratified",
    "scale_zorder_layout",
    # Tier 2 — 43 of the 50 rows whose latest green is round 6.
    # Integer-SUM / join-heavy shapes first (most exposed to driver-side
    # arrow/HUGEINT drift); graph/pipeline/sim fixpoints next; map-only
    # and small-result shapes later. SEVEN r6 rows defer to round 10 by
    # sitting past slot 50 (least drift-exposed: join_cross and
    # setop_union_all are tiny-dim/no-shuffle unions, meta_show_databases
    # and meta_show_create_table return constant metadata, func_array_ops
    # and func_conditional are pure column expressions pytest-covered,
    # dedup_distinct is a plain DISTINCT over stable columns).
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q4_priority_exists",
    "q5_local_supplier_volume",
    "q11_important_stock",
    "q12_priority_lateness",
    "q17_small_qty_revenue",
    "join_inner_chain",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_nonequi_band",
    "graph_pagerank_purchases",
    "agg_collect_set",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_id",
    "agg_grouping_sets",
    "agg_hll_intersect",
    "agg_weighted_avg_pandas",
    "dedup_keep_first",
    "dedup_semantic",
    "dedup_span_exact",
    "pipeline_corpus_curation",
    "sim_ivf_kmeans",
    "text_bigram_lm_nll",
    "text_bigram_nll_topk",
    "text_bm25_topk",
    "text_domain_kl",
    "text_hybrid_rrf",
    "text_repetition_stats",
    "page_filtered_sorted",
    "page_keyset",
    "page_limit_offset",
    "page_sort_limit",
    "page_topk_per_group",
    "setop_except",
    "setop_except_all",
    "setop_intersect",
    "setop_intersect_all",
    "setop_union_distinct",
    # Deferred-to-round-10 tail (still priority-ordered so they lead the
    # next rotation).
    "join_cross",
    "setop_union_all",
    "meta_show_databases",
    "meta_show_create_table",
    "func_array_ops",
    "func_conditional",
    "dedup_distinct",
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
