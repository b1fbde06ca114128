"""Versioned parquet sink with an atomic HEAD pointer — the minimal
snapshot / time-travel / rollback surface a production table needs,
expressed with nothing but immutable directories and one atomic rename
(the commit model a table format implements, minus the manifest log).

The reference's ingest pipeline overwrites ClickHouse tables in place
(`/root/reference/ingest.py`, `ranking_urls_ingestor.py`) — a failed
half-ingest leaves the table unreadable until re-run. Spark-first, the
same ingest becomes: write the WHOLE new state as an immutable version
directory, then atomically swap a one-line HEAD pointer. Readers resolve
HEAD once and only ever read immutable files, so they get snapshot
isolation for free; a crashed writer leaves an orphan directory, never a
broken table; "undo last ingest" is a pointer swap, not a restore.

Layout::

    <path>/_HEAD                 one line: the current version number
    <path>/_versions/v=N/*.parquet   immutable; never rewritten

100 TB notes: the swap is O(1) metadata regardless of data volume; every
version directory is write-once (object-store friendly — no
read-modify-write of existing objects); ``vacuum`` bounds storage to the
last K versions. On a real cluster the pointer swap routes through the
storage's atomic primitive (HDFS rename, S3 conditional PUT) — here it
is ``os.replace``, and URI-schemed paths are rejected loudly rather than
half-working (same contract as ``writers.compact_partitions``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_HEAD = "_HEAD"
_VERSIONS = "_versions"
_BATCH = "_SPARK_BATCH"


def _check_local(path: str) -> str:
    if "://" in path:
        raise ValueError(
            "versioned sink uses local-OS atomic rename for the HEAD swap; "
            f"URI path {path!r} needs the storage's atomic primitive "
            "(HDFS rename / S3 conditional PUT) wired in instead."
        )
    return path.rstrip("/")


def _vdir(base: str, v: int) -> str:
    return os.path.join(base, _VERSIONS, f"v={v:08d}")


def versions(path: str) -> list[int]:
    """Version numbers in CURRENT history (≤ HEAD), ascending.
    Directories above HEAD — crashed writers that never swapped the
    pointer, or versions abandoned by a rollback — are excluded: commit
    is the pointer swap, not the write, and a rollback rewrites history
    the way the one-line pointer model can express. Above-HEAD data
    stays on disk (readable via ``read_version`` for forensics) until
    ``vacuum`` reclaims it."""
    base = _check_local(path)
    head = current_version(path)
    if head is None:
        return []
    vroot = os.path.join(base, _VERSIONS)
    out = []
    for entry in os.listdir(vroot):
        if entry.startswith("v="):
            v = int(entry[2:])
            if v <= head:
                out.append(v)
    return sorted(out)


def current_version(path: str) -> int | None:
    base = _check_local(path)
    try:
        with open(os.path.join(base, _HEAD)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def snapshot_write(
    spark: SparkSession, df: DataFrame, path: str, batch_id: int | None = None
) -> int:
    """Commit ``df`` as the next version: write an immutable version
    directory, then atomically swap HEAD. A reader holding the old HEAD
    keeps reading the old (untouched) files; a crash before the swap
    leaves an orphan directory and the table still serves the prior
    version.

    ``batch_id`` tags the version with a streaming micro-batch id (written
    INSIDE the version directory before the swap, so it commits or
    vanishes atomically with the data) — the idempotency token
    ``foreach_batch_versioned`` uses for exactly-once commits."""
    base = _check_local(path)
    vroot = os.path.join(base, _VERSIONS)
    os.makedirs(vroot, exist_ok=True)
    # next = max over ALL version directories (committed, orphaned, or
    # abandoned-by-rollback) + 1 — HEAD+1 would collide with the
    # still-present directory of a rolled-back or crashed write.
    existing = [int(e[2:]) for e in os.listdir(vroot) if e.startswith("v=")]
    v = max(existing, default=0) + 1
    df.write.mode("error").parquet(_vdir(base, v))
    if batch_id is not None:
        with open(os.path.join(_vdir(base, v), _BATCH), "w") as fh:
            fh.write(str(batch_id))
            fh.flush()
            os.fsync(fh.fileno())
    tmp = os.path.join(base, f".{_HEAD}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(v))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(base, _HEAD))  # the commit point
    return v


def committed_batch_ids(path: str) -> set[int]:
    """Micro-batch ids whose versions are COMMITTED (≤ HEAD). A batch
    whose directory landed but whose pointer swap didn't is absent —
    replaying it re-commits, which is exactly right."""
    base = _check_local(path)
    out = set()
    for v in versions(path):
        try:
            with open(os.path.join(_vdir(base, v), _BATCH)) as fh:
                out.add(int(fh.read().strip()))
        except FileNotFoundError:
            pass
    return out


def foreach_batch_versioned(path: str):
    """Exactly-once streaming sink: ``writeStream.foreachBatch(...)``
    handler that commits each micro-batch as one atomic version and
    SKIPS batch ids already committed — Structured Streaming replays the
    in-flight micro-batch after a restart, and without an idempotency
    check every restart would duplicate it. The batch-id marker rides
    inside the version directory, so it becomes visible atomically with
    the data at the HEAD swap: crash before swap → marker invisible →
    replay re-commits; crash after swap → marker visible → replay
    no-ops. State is the table itself — no side ledger to drift.

    Versions are WHOLE-TABLE snapshots, so pair this with
    ``outputMode("complete")`` (or any per-trigger full-state result —
    e.g. the continuously maintained KL-drift / count-state monitors in
    ``streaming/``): each trigger atomically replaces the serving table
    AND retains the full per-trigger history for time travel."""

    def _fn(df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(path):
            return
        snapshot_write(df.sparkSession, df, path, batch_id=batch_id)

    return _fn


def read_version(spark: SparkSession, path: str, v: int) -> DataFrame:
    base = _check_local(path)
    return spark.read.parquet(_vdir(base, v))


def read_head(spark: SparkSession, path: str) -> DataFrame:
    """Read the table at its current committed version (one pointer read,
    then immutable files only — snapshot isolation under concurrent
    writes)."""
    head = current_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed version at {path}")
    return read_version(spark, path, head)


def rollback(path: str, v: int) -> int:
    """Point HEAD back at an earlier committed version — O(1) undo of a
    bad ingest; no data moves, the abandoned version stays readable (and
    vacuumable) for forensics."""
    base = _check_local(path)
    if v not in versions(path):
        raise ValueError(f"version {v} is not committed at {path}")
    tmp = os.path.join(base, f".{_HEAD}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(v))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(base, _HEAD))
    return v


def vacuum(path: str, keep: int = 2) -> list[int]:
    """Delete version directories beyond the newest ``keep`` committed
    versions. The HEAD version is never deleted even if it is old (a
    rolled-back table keeps serving); orphans above HEAD are removed too
    (crashed writers) — so don't run vacuum concurrently with an
    in-flight commit, the one scheduling constraint this model has.
    Returns the deleted version numbers."""
    base = _check_local(path)
    head = current_version(path)
    if head is None:
        return []
    committed = versions(path)
    keep_set = set(committed[-keep:]) | {head}
    vroot = os.path.join(base, _VERSIONS)
    deleted = []
    for entry in sorted(os.listdir(vroot)):
        if not entry.startswith("v="):
            continue
        v = int(entry[2:])
        if v in keep_set:
            continue
        shutil.rmtree(os.path.join(vroot, entry))
        deleted.append(v)
    return deleted
