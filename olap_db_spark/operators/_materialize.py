"""Materialization helper for data-sized intermediates (r13, guide §5).

Several operators pin multiply-consumed, data-sized frames (the shingled
corpus, simhash/class index tables, the k-means input, PageRank's node
table) with ``localCheckpoint``: lineage is truncated and the blocks live
ONLY on the executors that computed them — the right trade on local[*],
but on a real cluster one executor loss mid-query kills the whole query,
because a local checkpoint leaves no recompute path (r12 VERDICT #2).

``materialize`` keeps the local default byte-identical (same
localCheckpoint call, same storage level, plans unchanged) and adds a
conf-gated RELIABLE path for cluster deployments:

    spark.olap.reliableCheckpoint = true    (default false)
    spark.olap.checkpointDir      = <fault-tolerant path>  (optional if
                                    the SparkContext already has one)

With the gate on, frames go through ``DataFrame.checkpoint`` into the
checkpoint directory (HDFS/object store on a cluster), so a lost executor
re-reads the materialized blocks instead of failing the query. The cost —
one write + read of the frame through the reliable store — is the
standard price of fault tolerance at 100 TB; the gate stays off for
benches and local runs.

Retention (r12 ADVICE): checkpoint-backed frames cannot be unpersisted
explicitly — their blocks are freed when the last reference to the
DataFrame is garbage-collected and the ContextCleaner runs. In the
one-shot-per-query harness that happens naturally after each query's
action; a library-style caller invoking these operators repeatedly in
one long session should drop its result references promptly (or call
``spark.catalog.clearCache()`` between batches) so accumulated
checkpoint storage stays bounded. The k-means assignment, which uses a
plain ``persist``, has an explicit keep-last-2 unpersist registry in
``kmeans.py`` for the same reason.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize(
    df: DataFrame,
    eager: bool = True,
    storage: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Cut lineage and pin ``df``. Local default: ``localCheckpoint``
    (with ``storage`` when given — pass ``storage=None`` for Spark's
    deserialized default). Reliable path (conf-gated, see module doc):
    ``DataFrame.checkpoint`` into the configured checkpoint directory."""
    spark = df.sparkSession
    reliable = (
        spark.conf.get("spark.olap.reliableCheckpoint", "false").lower() == "true"
    )
    if reliable:
        sc = spark.sparkContext
        if not sc._jsc.sc().getCheckpointDir().isDefined():
            ckdir = spark.conf.get("spark.olap.checkpointDir", None)
            if ckdir is None:
                raise ValueError(
                    "spark.olap.reliableCheckpoint=true needs a checkpoint "
                    "directory: set spark.olap.checkpointDir or call "
                    "SparkContext.setCheckpointDir with a fault-tolerant path"
                )
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    if storage is None:
        return df.localCheckpoint(eager=eager)
    return df.localCheckpoint(eager=eager, storageLevel=storage)
