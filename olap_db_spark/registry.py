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
    # ROUND-13 WINDOW (first 50 reach the driver) — stale-row rotation,
    # executing the r12 rotation plan (r12 VERDICT #8). After
    # CORRECTNESS_r12 landed (50/50 green, the seventh consecutive
    # fully-green round), the staleness map is: 21 rows' latest green is
    # round 9 (the r12 deferred tail — they lead this window, as
    # promised), 50 rows' latest green is round 10. No red rows, no
    # never-checked rows. The window = the 21 r9 rows + the 29 most
    # drift-exposed r10 rows; the remaining 21 r10 rows defer to round 14
    # (listed at the bottom — they MUST lead the next rotation).
    #
    # Tier 1 — the 21 rows whose latest green is round 9 (the rotation
    # tripwire's must-have set).
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
    "sample_bernoulli",
    "sample_stratified",
    "scale_zorder_layout",
    "ts_user_lifetime",
    # Tier 2 — 29 of the 50 r10 rows, most drift-exposed first: the
    # entire k-means-fit family this round's optimizer restructures
    # (full-frame assignment — sim_ivf_search/refresh, hybrid RRF, the
    # PQ routes), the banded/graph dedup chain riding the r12
    # checkpoints, Python-worker rows, and the remaining plan-sensitive
    # join/aggregate shapes.
    "sim_ivf_search",
    "sim_ivf_refresh",
    "sim_hybrid_rrf_ivf",
    "sim_pq_search",
    "sim_pq_refresh",
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "dedup_cluster_best",
    "dedup_components",
    "dedup_lsh_eval",
    "dedup_lsh_incremental",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "dedup_keep_latest",
    "dedup_distinct",
    "mm_decode_resize_stats",
    "agg_heavy_hitters",
    "agg_quantiles",
    "agg_approx_count_distinct",
    "text_contamination_check",
    "text_dsir_select",
    "text_domain_cap",
    "text_pack_sequences",
    "ts_rollup_incremental",
    "scale_interval_bucket_join",
    "fuzzy_levenshtein_match",
    # Deferred-to-round-14 r10 tail (stale there; they lead the next
    # rotation): pure-expression aggregate/window forms, scalar func
    # families, cross join, metadata probes, three single-join TPC-H
    # revenue rows and four set-ops — all shapes with dedicated pytest +
    # fuzz coverage and no plan sensitivity. Still priority-ordered so
    # they lead the next rotation.
    "agg_argmax_family",
    "agg_histogram",
    "agg_hll_mergeable",
    "agg_ohlc_hourly",
    "agg_percentile_approx",
    "agg_pivot",
    "agg_rollup",
    "agg_string_agg",
    "agg_topk_per_key",
    "func_array_ops",
    "func_conditional",
    "join_cross",
    "meta_show_create_table",
    "meta_show_databases",
    "q14_promo_revenue",
    "q19_brand_band_revenue",
    "q6_forecast_revenue",
    "setop_intersect",
    "setop_intersect_all",
    "setop_union_all",
    "setop_union_distinct",
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
