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
# Round-4 rotation: slots 1-2 are the two round-3 hash-red queries
# (window_range_frame, dedup_keep_latest — root cause: the regenerated
# testdata switched events.ts from nanos to micros; catalog.py now detects
# the unit) so they re-earn green rows first. Then every query whose latest
# driver row predates round 3 — led by the events-based ts_* family, whose
# shared loader is exactly what changed this round — then the 7 queries NEW
# in round 4 (never driver-checked). Squeezed out to fit 50:
# sample_bernoulli / meta_select_one / scale_* (r02-green, code untouched)
# and the flagships (hash-green in CORRECTNESS_r03.json, unchanged).
_PRIORITY: tuple[str, ...] = (
    # round-3 reds, repaired this round (catalog ts-unit detection)
    "window_range_frame",
    "dedup_keep_latest",
    # events-based time series (loader changed this round: unit detection)
    "ts_tumbling_window",
    "ts_sliding_window",
    "ts_session_window",
    "ts_asof_prior_click",
    "ts_daily_rollup",
    "ts_gap_fill",
    "ts_funnel",
    "ts_cohort_retention",
    "agg_histogram",
    # flagships not seen since r02
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q19_brand_band_revenue",
    # aggregates not seen since r02
    "agg_approx_count_distinct",
    "agg_pivot",
    "agg_percentile_approx",
    # scalar families not seen since r02
    "func_json_extract",
    # text-analysis family (r02-only; stats/lang-id/fingerprint rotate
    # out this round to make room for never-checked queries)
    # (text_quality_signals/token_count rotate out: the signals function
    # is exercised inside in-window pipeline_corpus_curation)
    # (text_quality_filter's rule is re-exercised by in-window
    # pipeline_corpus_curation)
    "text_pack_sequences",
    # fuzzy dedup family (r02-only; dedup_exact's rule is re-exercised by
    # pipeline_corpus_curation, which is in-window)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    # similarity / ANN family (r02-only)
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "sim_ivf_kmeans",
    # (sim_ivf_centroids' path is a subset of in-window sim_ivf_search)
    "sim_ivf_search",
    "sim_pq_search",
    # multimodal (r02-only)
    "mm_real_decode_stats",
    # metadata (r02-only)
    "meta_show_tables",
    # NEW in round 4 — never driver-checked
    "agg_argmax_family",
    "agg_topk_per_key",
    "agg_ohlc_hourly",
    "text_tfidf_topterms",
    "text_bm25_search",
    "func_regexp_family",
    "mm_audio_rms_windows",
    "agg_hll_mergeable",
    "pipeline_corpus_curation",
    "text_bigram_lm_nll",
    "scale_interval_bucket_join",
    "mm_video_frame_sample",
    "agg_corr_covar",
    "window_distribution",
    "func_bitwise_family",
    "fuzzy_levenshtein_match",
    "func_date_arith",
    "agg_string_agg",
    "text_contamination_check",
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
