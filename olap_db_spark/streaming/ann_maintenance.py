"""Streaming twin of incremental IVF index maintenance
(operators/similarity.sim_ivf_refresh) — continuous vector appends
routed into a standing ANN index, with the refresh decision evaluated on
a slower cadence than the append.

Per micro-batch the handler routes ONLY the arriving (vec_id, qv) rows
to their nearest EXISTING centroid (``ivf_route`` — the same exact
integer argmin as the Lloyd assignment, broadcast k·dim ints, no re-fit)
and commits the assignments as an exactly-once APPEND-DELTA version
keyed by the micro-batch id, so a Structured Streaming replay after a
restart re-commits nothing. The MAINTENANCE pass (which cells crossed
the 20% appended threshold, and their re-centered components) is
``ivf_refresh_from_log`` — a read-side evaluation over the committed
assignment log that a deployment runs per maintenance window, not per
trigger: exactly the cadence split ``streaming/retrieval.py``'s
docstring promises, with both halves sharing the batch operator's
pipeline (``ivf_route`` / ``ivf_refresh_report``), so stream == batch is
asserted in tests/test_streaming_ann.py on the identical base/appended
split.

Scale shape: routing is stateless per batch — no streaming aggregation
state; the standing state is the index itself (centroid table pinned for
the life of the query — O(k·dim) ints — plus the assignment log the
versioned sink maintains as append deltas, commit cost O(batch)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import ivf_refresh_report, ivf_route
from ..sources import versioned as V
from ..sources.versioned import foreach_batch_versioned


def ivf_append_handler(cent: DataFrame, results_path: str):
    """``writeStream.foreachBatch(...)`` handler routing each arriving
    micro-batch of (vec_id, qv) rows against the standing centroid table
    and appending the (vec_id, qv, cluster) assignments exactly-once.

    ``cent`` is pinned here for the life of the query (O(k·dim) ints),
    standing in for the persisted centroid table a deployment reads."""
    cent = cent.localCheckpoint()
    append = foreach_batch_versioned(results_path, mode="append")

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        append(ivf_route(batch_df.select("vec_id", "qv"), cent), batch_id)

    return _fn


def ivf_refresh_from_log(
    spark: SparkSession,
    assigned: DataFrame,
    cent: DataFrame,
    counts: DataFrame,
    results_path: str,
) -> DataFrame:
    """The slow-cadence maintenance pass over the committed assignment
    log: per-cell base/appended counts, the ≥20% refresh decision, and
    the re-centered components — ``ivf_refresh_report`` on exactly the
    rows the streaming handler committed, so its result equals the batch
    operator's on the identical split."""
    nassign = V.read_head(spark, results_path).select("vec_id", "qv", "cluster")
    return ivf_refresh_report(assigned, cent, counts, nassign)
