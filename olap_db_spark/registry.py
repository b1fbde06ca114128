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
    "olap_db_spark.operators.text_index",
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
    # ROUND-12 WINDOW (first 50 reach the driver) — stale-row rotation,
    # executing the r11 VERDICT's #1 ask. Round 11 went 50/50 green (the
    # sixth consecutive fully-green round); after it, 17 rows' latest
    # green is round 8 (they go HARD-stale the moment CORRECTNESS_r12
    # lands: latest_round-4 == 8) and 50 rows' latest green is round 9.
    # The window carries all 17 r8 rows plus the 33 most drift-exposed
    # r9 rows; 17 r9 rows defer to round 13 (listed at the bottom — they
    # MUST lead the next rotation).
    #
    # Tier 0 — NEW in round 12, never driver-checked: perceptual-hash
    # image near-dup + its linear-output assignment twin (r11 VERDICT #5)
    # and read-side time travel under an oracle row (r11 VERDICT stretch
    # c). Each displaces one trailing tier-2 row past slot 50.
    "mm_phash_dedup",
    "mm_phash_groups",
    "mm_phash_assign_from_index",
    "meta_read_version_asof",
    # Tier 1 — the 17 rows whose latest green is round 8 (the rotation
    # tripwire's must-have set, named verbatim in the r11 VERDICT).
    "agg_basic_stats",
    "func_bitwise_family",
    "func_date_arith",
    "meta_show_tables",
    "text_bm25_search",
    "text_doc_chunking",
    "text_domain_mixture",
    "text_fingerprint",
    "text_lang_id",
    "text_ngram_topk",
    "text_pii_redact",
    "text_quality_filter",
    "text_quality_signals",
    "text_stats_by_lang",
    "text_token_count_bpe",
    "window_distribution",
    "window_range_frame",
    # Tier 2 — 33 of the 50 r9 rows, most drift-exposed first
    # (decorrelated TPC-H joins, the full 8-type join family, pagerank
    # fixpoint, Python-worker multimodal/pipeline rows, pagination
    # keyset/top-k plans, banded dedup and sampled IVF/PQ evals — the
    # shapes most sensitive to plan changes and arrow/HUGEINT driver
    # drift). The LAST FOUR names sit at slots 51-54 once round-12's
    # four tier-0 registrations land, deferring to round 13 by design
    # (statistical-contract / layout shapes with dedicated pytest
    # coverage).
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q4_priority_exists",
    "q5_local_supplier_volume",
    "q11_important_stock",
    "q12_priority_lateness",
    "q17_small_qty_revenue",
    "join_full_outer",
    "join_inner_chain",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_nonequi_band",
    "join_right_outer",
    "graph_pagerank_purchases",
    "pipeline_corpus_curation",
    "page_filtered_sorted",
    "page_keyset",
    "page_limit_offset",
    "page_sort_limit",
    "page_topk_per_group",
    "mm_binary_features",
    "dedup_keep_first",
    "dedup_lsh_eval_sampled",
    "dedup_semantic",
    "dedup_span_exact",
    "sim_ivf_eval_sampled",
    "sim_ivf_kmeans",
    "sim_pq_eval_sampled",
    "ts_user_lifetime",
    "scale_zorder_layout",
    "sample_bernoulli",
    "sample_stratified",
    # Deferred-to-round-13 r9 tail (stale there; they lead the next
    # rotation): seven pure-expression aggregation forms, func_math_family,
    # two set-ops, six map-only/expression text_* rows and meta_select_one
    # — all shapes with dedicated pytest + fuzz coverage and no plan
    # sensitivity (single-pass groupBy or per-row expressions). Still
    # priority-ordered so they lead the next rotation.
    "agg_collect_set",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_id",
    "agg_grouping_sets",
    "agg_hll_intersect",
    "agg_weighted_avg_pandas",
    "func_math_family",
    "setop_except",
    "setop_except_all",
    "text_bigram_lm_nll",
    "text_bigram_nll_topk",
    "text_bm25_topk",
    "text_domain_kl",
    "text_hybrid_rrf",
    "text_repetition_stats",
    "meta_select_one",
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
