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
    # ROUND-7 WINDOW (first 50 reach the driver) — stale-row rotation.
    # Round 6 went 50/50 green, so this window is the r6 VERDICT's #1 ask:
    # re-check the 56 rows whose latest driver green predates round 5 (and
    # therefore predates the HUGEINT-cast fix + the driver's arrow-fetch
    # change — the exact class that silently flapped in r4/r5).
    #
    # Tier 0 — NEW in round 7, never driver-checked.
    "sim_hybrid_rrf_ivf",
    "text_dsir_select",
    "dedup_cluster_best",
    "dedup_lsh_eval",
    "dedup_incremental",
    "text_domain_cap",
    # Tier 1 — the 11 rows whose latest green is round 3.
    "agg_quantiles",
    "agg_rollup",
    "window_ranking",
    "window_running_sum",
    "window_lag_lead",
    "func_url_normalize",
    "func_split_key_epoch",
    "func_explode_wordcount",
    "func_string_family",
    "func_date_family",
    "mm_decode_resize_stats",
    # Tier 2 — 37 of the 45 rows whose latest green is round 4 (the other
    # two, window_distribution and window_range_frame, were displaced by
    # round-7 additions; see the trailing note). The six
    # deferred to round 8 (meta_show_tables, mm_real_decode_stats,
    # mm_video_frame_sample, mm_audio_rms_windows, func_bitwise_family,
    # func_date_arith) are the ones least exposed to the HUGEINT class —
    # metadata / deterministic-synth multimodal / pure scalar shapes with
    # no integer SUM in the oracle — and all pass the local arrow-fetch
    # parity run (tools/drive_contract.py).
    "agg_approx_count_distinct",
    "agg_argmax_family",
    "agg_histogram",
    "agg_hll_mergeable",
    "agg_ohlc_hourly",
    "agg_percentile_approx",
    "agg_pivot",
    "agg_string_agg",
    "agg_topk_per_key",
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_keep_latest",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "func_json_extract",
    "func_regexp_family",
    "fuzzy_levenshtein_match",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q19_brand_band_revenue",
    "scale_interval_bucket_join",
    "sim_ann_lsh",
    "sim_ivf_search",
    "sim_knn_bruteforce",
    "sim_pq_search",
    "text_contamination_check",
    "text_pack_sequences",
    "text_tfidf_topterms",
    "ts_asof_prior_click",
    "ts_cohort_retention",
    "ts_daily_rollup",
    "ts_funnel",
    "ts_gap_fill",
    "ts_session_window",
    "ts_sliding_window",
    "ts_tumbling_window",
    # window_distribution and window_range_frame (both r4) roll to round 8
    # — displaced by the two new round-7 queries (never-checked queries
    # take precedence over stale-green rotation; see
    # tests/test_registry.py::test_driver_window_contents). Likewise
    # ts_gap_fill, ts_session_window, ts_sliding_window and
    # ts_tumbling_window (all r4, above): they stay listed for round-8
    # ordering but fall past slot 50 this round, displaced by the six
    # never-checked round-7 queries (dedup_cluster_best, dedup_lsh_eval,
    # dedup_incremental, text_domain_cap and the two above).
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
