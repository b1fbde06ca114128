"""Streaming twin of incremental FUZZY dedup (operators/fuzzy_dedup.
dedup_lsh_incremental) — continuous near-dup assignment of arriving
documents against a standing corpus index.

Per micro-batch the handler shingles ONLY the arriving docs, MinHash-bands
them, equi-joins their band keys against the PERSISTED base index (built
once from the base corpus, reused across every trigger), exact-Jaccard
verifies the candidates, and commits one (new_doc, assigned_group,
n_matches) row per arriving doc as an exactly-once APPEND-DELTA version
keyed by the micro-batch id — so a Structured Streaming replay after a
restart re-commits nothing.

The pipeline is the SAME ``lsh_assign`` helper the batch operator runs
(tests/test_streaming_curation.py asserts the union of all committed
batches equals the batch query on the identical base/new split — stream ==
batch, the package-wide twin pattern).

Scale shape: assignment is stateless per batch — no streaming aggregation
state at all (the per-doc grouping runs inside the micro-batch, which is a
static frame). The standing state is the base index itself: band keys
(4 × 16-byte rows per doc) and shingle sets, persisted/bucketable tables a
real deployment maintains with the same cadence discipline as
``sim_ivf_refresh``. Signature hashing is paid only for NEW docs; the base
corpus is never re-shingled per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.fuzzy_dedup import _shingled, lsh_assign, lsh_base_index
from ..sources.versioned import foreach_batch_versioned


def lsh_incremental_handler(base_docs: DataFrame, results_path: str):
    """``writeStream.foreachBatch(...)`` handler assigning each arriving
    micro-batch of (doc_id, text) rows to ``base_docs``'s near-dup groups.

    The collapsed base index (one row per distinct shingle set — rep id,
    member count, shingles) is materialized ONCE here; localCheckpoint
    pins it for the life of the query, standing in for the persisted
    index table a deployment would maintain. Each batch's assignments
    commit via the exactly-once versioned append."""
    from ..operators._materialize import materialize

    base_index = materialize(lsh_base_index(_shingled(base_docs)), storage=None)
    append = foreach_batch_versioned(results_path, mode="append")

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        new_sh = _shingled(batch_df.select("doc_id", "text"))
        append(lsh_assign(new_sh, base_index), batch_id)

    return _fn


def lsh_incremental_handler_from_index(index_path: str, results_path: str):
    """``foreachBatch`` handler assigning arriving docs against the
    PERSISTED LSH index table at ``index_path`` (``text_index.
    refresh_lsh_index``'s output) — the end-to-end production wiring
    (r10 VERDICT stretch a): the in-memory variant above pins the
    collapsed index for the life of the query, while this one reads the
    classes table per trigger, so an index refresh on the ingest cadence
    is picked up at the NEXT trigger with no query restart. The
    assignment pipeline is the same shared ``lsh_assign``; per-trigger
    cost stays O(batch · collisions) — the corpus is never re-shingled,
    and the table read is a column-pruned scan of O(distinct texts)
    rows that a deployment buckets by band key."""
    append = foreach_batch_versioned(results_path, mode="append")

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.text_index import _p

        base_index = batch_df.sparkSession.read.parquet(_p(index_path, "classes"))
        new_sh = _shingled(batch_df.select("doc_id", "text"))
        append(lsh_assign(new_sh, base_index), batch_id)

    return _fn
