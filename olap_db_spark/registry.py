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
    # ROUND-8 WINDOW (first 50 reach the driver) — stale-row rotation.
    # Rounds 6 and 7 both went 50/50 green, so this window executes the r7
    # VERDICT's #1 ask: the 12 rows whose latest driver green is round 4,
    # then the 42 rows whose latest green is round 5 filling the remaining
    # slots (ordered so the most defer-tolerant rows sit last — they are
    # the ones displaced past slot 50 as new round-8 queries claim their
    # never-checked slots at the top).
    #
    # Tier 0 — NEW in round 8, never driver-checked.
    "sim_ivf_eval",
    "sim_pq_eval",
    "dedup_minhash_groups",
    # Tier 1 — the 12 rows whose latest green is round 4.
    "window_range_frame",
    "window_distribution",
    "meta_show_tables",
    "ts_tumbling_window",
    "ts_sliding_window",
    "ts_session_window",
    "ts_gap_fill",
    "mm_real_decode_stats",
    "mm_audio_rms_windows",
    "mm_video_frame_sample",
    "func_bitwise_family",
    "func_date_arith",
    # Tier 2 — the 42 rows whose latest green is round 5. Integer-SUM /
    # join-heavy shapes first (most exposed to driver-side arrow/HUGEINT
    # drift). With the three round-8 additions holding tier-0 slots,
    # 35 of the 42 fit the window and SEVEN defer to round 9:
    # ts_user_lifetime, mm_binary_features and func_math_family (pure
    # column arithmetic / mapInPandas shapes, pytest-covered), plus the
    # four least drift-exposed rows deliberately ordered last
    # (meta_select_one: constant literal row; sample_bernoulli /
    # sample_stratified: content-addressed coins under a 5-sigma pytest
    # contract; scale_zorder_layout: layout property, plan-gated in
    # pytest).
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
    "agg_basic_stats",
    "agg_corr_covar",
    "agg_count_min_sketch",
    "agg_median_exact",
    "agg_sum_map",
    "dedup_exact",
    "join_asof_nearest",
    "scale_bloom_semi_join",
    "scale_repartition_agg",
    "scale_salted_skew_join",
    "sim_ivf_centroids",
    "text_bm25_search",
    "text_token_count_bpe",
    "text_doc_chunking",
    "text_domain_mixture",
    "text_fingerprint",
    "text_lang_id",
    "text_ngram_topk",
    "text_pii_redact",
    "text_quality_filter",
    "text_quality_signals",
    "text_stats_by_lang",
    "ts_sequence_match",
    "ts_user_lifetime",
    "mm_binary_features",
    "func_math_family",
    "meta_select_one",
    "sample_bernoulli",
    "sample_stratified",
    "scale_zorder_layout",
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
