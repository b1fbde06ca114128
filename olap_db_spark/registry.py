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
    # ROUND-10 WINDOW (first 50 reach the driver) — stale-row rotation.
    # Round 9 went 50/50 green (the fourth consecutive fully-green round);
    # this window executes the r9 VERDICT's #1 ask: the 10 rows whose
    # latest driver green is round 6 (they deferred past slot 50 last
    # round and the rotation test now demands them), then 40 of the 50
    # rows whose latest green is round 7. Ordered so the most
    # defer-tolerant rows sit last — they are the ones displaced past
    # slot 50 as new round-10 queries claim never-checked slots at the
    # top of the tuple.
    #
    # Tier 0 — NEW in round 10, never driver-checked (each displaces one
    # tier-2 row past slot 50).
    "sim_ivf_refresh",
    "dedup_lsh_incremental",
    "agg_heavy_hitters",
    "sim_pq_refresh",
    "ts_rollup_incremental",
    # Tier 1 — the 10 rows whose latest green is round 6 (the rotation
    # test's must-have set).
    "join_cross",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_intersect_all",
    "meta_show_databases",
    "meta_show_create_table",
    "func_array_ops",
    "func_conditional",
    "dedup_distinct",
    # Tier 2 — 40 of the 50 rows whose latest green is round 7.
    # Integer-SUM / join-heavy / fixpoint shapes first (most exposed to
    # driver-side arrow/HUGEINT drift and plan changes); map-only and
    # small-result shapes later. THIRTEEN r7 rows defer to round 11 by
    # sitting past slot 50 (least drift-exposed: func_date_family,
    # func_explode_wordcount, func_json_extract, func_regexp_family,
    # func_split_key_epoch, func_string_family, func_url_normalize are
    # pure column expressions pytest-covered; window_lag_lead,
    # window_ranking, window_running_sum are single-pass deterministic
    # windows with dedicated pytest coverage; ts_cohort_retention,
    # ts_daily_rollup and ts_funnel — displaced by the three later tier-0
    # additions — are single-aggregation shapes with event-fuzz pytest
    # coverage, and ts_daily_rollup's aggregation is re-exercised through
    # ts_rollup_incremental's fresh driver row, which shares it).
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q19_brand_band_revenue",
    "agg_approx_count_distinct",
    "agg_argmax_family",
    "agg_histogram",
    "agg_hll_mergeable",
    "agg_ohlc_hourly",
    "agg_percentile_approx",
    "agg_pivot",
    "agg_quantiles",
    "agg_rollup",
    "agg_string_agg",
    "agg_topk_per_key",
    "dedup_cluster_best",
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "dedup_keep_latest",
    "dedup_lsh_eval",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "fuzzy_levenshtein_match",
    "mm_decode_resize_stats",
    "scale_interval_bucket_join",
    "sim_ann_lsh",
    "sim_hybrid_rrf_ivf",
    "sim_ivf_search",
    "sim_knn_bruteforce",
    "sim_pq_search",
    "text_contamination_check",
    "text_domain_cap",
    "text_dsir_select",
    "text_pack_sequences",
    "text_tfidf_topterms",
    "ts_asof_prior_click",
    "ts_cohort_retention",
    "ts_daily_rollup",
    "ts_funnel",
    # Deferred-to-round-11 tail (still priority-ordered so they lead the
    # next rotation).
    "func_date_family",
    "func_explode_wordcount",
    "func_json_extract",
    "func_regexp_family",
    "func_split_key_epoch",
    "func_string_family",
    "func_url_normalize",
    "window_lag_lead",
    "window_ranking",
    "window_running_sum",
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
