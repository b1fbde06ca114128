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
    # ROUND-11 WINDOW (first 50 reach the driver) — stale-row rotation,
    # executing the r10 VERDICT's #1 ask. Round 10 went 50/50 green (the
    # fifth consecutive fully-green round); after it, 15 rows' latest
    # green is round 7 (they go HARD-stale the moment CORRECTNESS_r11
    # lands: latest_round-4 == 7) and 50 rows' latest green is round 8.
    # The window carries all 15 r7 rows plus the 33 most drift-exposed
    # r8 rows; 17 r8 rows defer to round 12 (listed at the bottom — they
    # become hard-stale there and MUST lead the next rotation).
    #
    # Tier 0 — NEW in round 11, never driver-checked: the from-index
    # query twins (r10 VERDICT #5). Each displaces one trailing tier-2
    # row past slot 50.
    "text_bm25_from_index",
    "dedup_assign_from_index",
    # Tier 1 — the 15 rows whose latest green is round 7 (the rotation
    # tripwire's must-have set once r11 lands).
    "func_date_family",
    "func_explode_wordcount",
    "func_json_extract",
    "func_regexp_family",
    "func_split_key_epoch",
    "func_string_family",
    "func_url_normalize",
    "text_tfidf_topterms",
    "ts_asof_prior_click",
    "ts_cohort_retention",
    "ts_daily_rollup",
    "ts_funnel",
    "window_lag_lead",
    "window_ranking",
    "window_running_sum",
    # Tier 2 — 35 of the 50 r8 rows, most drift-exposed first
    # (decorrelated TPC-H joins, skew/bloom/runtime-filter plans,
    # k-means/IVF/PQ fixpoints, Python-worker multimodal rows, sessionizing
    # windows — the shapes most sensitive to plan changes and arrow/HUGEINT
    # driver drift); the LAST TWO names sit at slots 51-52 once both
    # tier-0 twins register, deferring to round 12 by design
    # (single-pass deterministic windows with dedicated pytest coverage).
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q18_large_volume_orders",
    "q20_promotion_suppliers",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "join_asof_nearest",
    "scale_bloom_semi_join",
    "scale_repartition_agg",
    "scale_salted_skew_join",
    "sim_ivf_centroids",
    "sim_ivf_eval",
    "sim_pq_eval",
    "dedup_exact",
    "dedup_minhash_groups",
    "agg_corr_covar",
    "agg_count_min_sketch",
    "agg_median_exact",
    "agg_sum_map",
    "mm_audio_rms_windows",
    "mm_real_decode_stats",
    "mm_video_frame_sample",
    "ts_gap_fill",
    "ts_sequence_match",
    "ts_session_window",
    "ts_sliding_window",
    "ts_tumbling_window",
    "window_distribution",
    "window_range_frame",
    # Deferred-to-round-12 r8 tail (hard-stale there; they lead the next
    # rotation): func_bitwise_family, func_date_arith, meta_show_tables,
    # agg_basic_stats, text_bm25_search (its scoring helper earns a fresh
    # row via text_bm25_from_index, which shares _bm25_score_topk) and the
    # ten map-only text_* rows — all pure-expression/map-only shapes with
    # dedicated pytest + fuzz coverage, plus the two overflow windows
    # above. Still priority-ordered so they lead the next rotation.
    "func_bitwise_family",
    "func_date_arith",
    "meta_show_tables",
    "agg_basic_stats",
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
