"""Streaming twin of ``sim_hybrid_rrf_ivf`` — per-trigger hybrid
retrieval over a CONTINUOUSLY APPENDED embedding corpus (r8 verdict
stretch item b), composing two proven pieces:

- the exactly-once versioned APPEND sink (``sources/versioned.py``):
  each micro-batch of new embeddings commits as a manifest-lite delta,
  so the cumulative corpus is one bounded file-list read and a replayed
  batch id is a no-op;
- the batch hybrid-retrieval pipeline (``operators/relevance.py
  _hybrid_ivf_df``): BM25 lexical top-50 fused with the IVF-routed
  semantic top-50, parameterized over the embedding corpus.

Per trigger the handler (1) appends the batch to the versioned corpus,
(2) re-runs retrieval over the corpus HEAD — the freshly committed
cumulative table — and (3) commits the fused top-10 as one atomic
version of the RESULTS table, tagged with the same batch id. Both sinks
are idempotent on the batch id, so a Structured Streaming replay after a
restart re-commits neither (and a crash BETWEEN the two commits heals on
replay: the corpus append no-ops, the result re-runs).

Correctness contract (tests/test_streaming.py): after all triggers, the
results HEAD equals the BATCH ``sim_hybrid_rrf_ivf`` over the full
embedding table — stream == batch, the same oracle pattern every
streaming twin in this package uses.

Scale: the per-trigger retrieval cost is the batch pipeline's (index
rebuild included — at production scale the k-means index would be
refreshed on a slower cadence than the append, which this composition
expresses by swapping the handler's retrieval step; the commit machinery
is unchanged). The append cost is O(new rows) — never the corpus. The
slower-cadence index maintenance itself is a real, oracle-checked
operator: ``operators.similarity.sim_ivf_refresh`` routes appended
vectors to existing centroids map-side and re-centers only the cells
whose appended count crossed a threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.relevance import _hybrid_ivf_df
from ..sources.versioned import (
    committed_batch_ids,
    foreach_batch_versioned,
    read_head,
    snapshot_write,
)


def hybrid_retrieval_handler(sf_dir: str, corpus_path: str, results_path: str):
    """``writeStream.foreachBatch(...)`` handler: append-then-retrieve
    with exactly-once semantics on BOTH tables."""
    append = foreach_batch_versioned(corpus_path, mode="append")

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        append(batch_df, batch_id)  # no-op if this batch already committed
        if batch_id in committed_batch_ids(results_path):
            return  # full replay of a completed trigger
        result = _hybrid_ivf_df(
            spark, sf_dir, emb=read_head(spark, corpus_path)
        )
        snapshot_write(spark, result, results_path, batch_id=batch_id)

    return _fn
