"""Versioned parquet sink with an atomic HEAD pointer — the minimal
snapshot / time-travel / rollback surface a production table needs,
expressed with nothing but immutable directories and one atomic pointer
swap (the commit model a table format implements, minus the manifest log).

The reference's ingest pipeline overwrites ClickHouse tables in place
(`/root/reference/ingest.py`, `ranking_urls_ingestor.py`) — a failed
half-ingest leaves the table unreadable until re-run. Spark-first, the
same ingest becomes: write the new state as an immutable version
directory, then atomically swap a one-line HEAD pointer. Readers resolve
HEAD once and only ever read immutable files, so they get snapshot
isolation for free; a crashed writer leaves an orphan directory, never a
broken table; "undo last ingest" is a pointer swap, not a restore.

Layout::

    <path>/_HEAD                      one line: the committed-version
                                      chain in commit order; the last
                                      entry is the current version
    <path>/_versions/v=N/*.parquet    immutable; never rewritten
    <path>/_versions/v=N/_MANIFEST    (append-delta versions only) the
                                      version's full file list — its own
                                      new files plus every parent file

Commit model: the pointer file records the COMMITTED CHAIN, not just the
tip. ``versions()`` / ``committed_batch_ids()`` / ``vacuum()`` all read
the chain, so a version abandoned by ``rollback`` — or a crashed writer's
orphan directory — can never re-enter history when later commits raise
the head number past it (it stays on disk, readable via ``read_version``
for forensics, until ``vacuum`` reclaims it).

Two write modes:

- ``snapshot_write`` — the version directory holds the WHOLE table
  (pair with streaming ``outputMode("complete")``).
- ``append_write`` — manifest-lite deltas: the version directory holds
  only the NEW files, and ``_MANIFEST`` lists parent files + new files,
  so a version read is still one bounded file-list scan and commit cost
  is O(new data), not O(table). This is what exactly-once streaming
  APPEND mode needs — a 100 TB table cannot rewrite itself per trigger.

100 TB notes: the swap is O(1) metadata regardless of data volume; every
version directory is write-once (object-store friendly — no
read-modify-write of existing objects); ``vacuum`` bounds storage to the
last K versions plus whatever their manifests still reference. Paths may
be plain local paths or URI-schemed (``file://``, ``hdfs://``,
``s3a://``): URI paths route every control-plane operation through the
Hadoop FileSystem API (``sources/_fs.py``), where the pointer swap is a
write-then-rename (atomic for fresh names on HDFS; S3 production would
use a conditional PUT — see ``_fs._HadoopFS.write_text_atomic``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from olap_db_spark.sources._fs import fs_for

_HEAD = "_HEAD"
_VERSIONS = "_versions"
_BATCH = "_SPARK_BATCH"
_MANIFEST = "_MANIFEST"
# Pointer-format stamp. Three formats exist in the wild: the original
# head-only pointer (one bare integer), the unstamped chain (integers in
# commit order), and the stamped chain written since. The stamp makes the
# head-only format detectable — without it, a legacy pointer parses as a
# one-entry chain and every earlier committed version silently drops out
# of history (vacuum reclaims them regardless of keep, rollback refuses
# them, their batch-id idempotency markers vanish).
_FORMAT_TOKEN = "format=2"


def _vdir(base: str, v: int) -> str:
    return f"{base.rstrip('/')}/{_VERSIONS}/v={v:08d}"


def _read_chain(path: str) -> list[int]:
    """The committed chain from the pointer file, commit order (strictly
    increasing by construction: a new commit always numbers above every
    existing directory). Missing pointer → no commits.

    Resilience/migration rules:
    - If the pointer is missing but its parked backup exists, read the
      backup: a URI-path pointer swap parks the old file at ``_HEAD.bak``
      before renaming the new one into place (``_fs.write_text_atomic``),
      so a crash inside the swap window must present the prior chain —
      never an uninitialized table whose next commit restarts history.
    - A stamped pointer (``format=2 ...``) is the chain verbatim.
    - An unstamped SINGLE integer is ambiguous: the legacy head-only
      format (whose committed history was every directory <= head) and
      an intermediate-format one-entry chain (e.g. after a vacuum to
      keep=1) are byte-identical. The chain adopts ONLY the head itself:
      expanding to every directory <= head would adopt crash orphans and
      rolled-back directories into committed history — including their
      batch-id markers, so a streaming replay of such a batch would
      wrongly no-op (silent data loss). The conservative read costs a
      true legacy table its pre-head HISTORY listing (rollback targets,
      old batch markers — none of which the legacy code could use
      anyway); the directories stay on disk, readable via
      ``read_version`` for forensics, until vacuum reclaims them. An
      unstamped MULTI-entry pointer is the intermediate chain format and
      parses verbatim; any subsequent commit, rollback, or vacuum
      rewrites the pointer stamped and retires the ambiguity.
    """
    fs = fs_for(path)
    ptr = f"{path.rstrip('/')}/{_HEAD}"
    try:
        text = fs.read_text(ptr)
    except FileNotFoundError:
        try:
            text = fs.read_text(ptr + ".bak")
        except FileNotFoundError:
            # A URI-path pointer swap parks _HEAD at _HEAD.bak, renames
            # the fresh pointer in, then deletes the backup — at least
            # one of the two files exists at every instant. A reader
            # that missed _HEAD during the park window and then missed
            # the already-retired backup must re-probe _HEAD once (the
            # swap has landed by then) instead of reporting an
            # uninitialized table over a fully committed chain.
            try:
                text = fs.read_text(ptr)
            except FileNotFoundError:
                return []
    toks = text.split()
    if toks and toks[0] == _FORMAT_TOKEN:
        return [int(t) for t in toks[1:]]
    vals = [int(t) for t in toks]
    return vals


def _write_chain(path: str, chain: list[int]) -> None:
    fs = fs_for(path)
    fs.write_text_atomic(
        f"{path.rstrip('/')}/{_HEAD}",
        " ".join([_FORMAT_TOKEN] + [str(v) for v in chain]),
    )


def _list_version_dirs(path: str) -> list[int]:
    """Every version directory on disk — committed, orphaned, or
    abandoned — for collision-free numbering and vacuum sweeps."""
    fs = fs_for(path)
    vroot = f"{path.rstrip('/')}/{_VERSIONS}"
    if not fs.exists(vroot):
        return []
    return sorted(
        int(e[2:]) for e in fs.listdir(vroot) if e.startswith("v=")
    )


def _data_files(path: str, v: int) -> list[str]:
    """Relative paths (under ``_versions/``) of version ``v``'s parquet
    files — from its manifest when it has one (append-delta version),
    else its own directory listing (snapshot version). A missing version
    raises a friendly FileNotFoundError on every filesystem (the Hadoop
    shim's listdir would otherwise surface a raw Java stacktrace)."""
    fs = fs_for(path)
    vdir = _vdir(path, v)
    if not fs.exists(vdir):
        raise FileNotFoundError(f"version {v} not found at {path}")
    try:
        manifest = fs.read_text(f"{vdir}/{_MANIFEST}")
        return [line for line in manifest.splitlines() if line]
    except FileNotFoundError:
        pass
    return [
        f"v={v:08d}/{name}"
        for name in fs.listdir(vdir)
        if name.endswith(".parquet") and not name.startswith((".", "_"))
    ]


def versions(path: str) -> list[int]:
    """Version numbers in CURRENT history, ascending. The pointer file
    records the committed chain explicitly, so directories outside it —
    crashed writers that never swapped the pointer, or versions abandoned
    by a rollback — are excluded even after later commits number past
    them: commit is the pointer swap, not the write. Out-of-history data
    stays on disk (readable via ``read_version`` for forensics) until
    ``vacuum`` reclaims it."""
    return _read_chain(path)


def current_version(path: str) -> int | None:
    chain = _read_chain(path)
    return chain[-1] if chain else None


def _commit(path: str, v: int, batch_id: int | None) -> None:
    """Shared commit tail: stamp the optional batch marker INSIDE the
    version directory (so it becomes visible atomically with the data),
    then swap the pointer — the commit point."""
    fs = fs_for(path)
    if batch_id is not None:
        fs.write_text(f"{_vdir(path, v)}/{_BATCH}", str(batch_id))
    _write_chain(path, _read_chain(path) + [v])


def _next_version(path: str) -> int:
    # next = max over ALL version directories (committed, orphaned, or
    # abandoned-by-rollback) + 1 — HEAD+1 would collide with the
    # still-present directory of a rolled-back or crashed write.
    return max(_list_version_dirs(path), default=0) + 1


def snapshot_write(
    spark: SparkSession, df: DataFrame, path: str, batch_id: int | None = None
) -> int:
    """Commit ``df`` as the next version holding the WHOLE table state:
    write an immutable version directory, then atomically swap the
    pointer. A reader holding the old HEAD keeps reading the old
    (untouched) files; a crash before the swap leaves an orphan directory
    and the table still serves the prior version.

    ``batch_id`` tags the version with a streaming micro-batch id (written
    inside the version directory before the swap, so it commits or
    vanishes atomically with the data) — the idempotency token
    ``foreach_batch_versioned`` uses for exactly-once commits."""
    fs = fs_for(path)
    fs.mkdirs(f"{path.rstrip('/')}/{_VERSIONS}")
    v = _next_version(path)
    df.write.mode("error").parquet(_vdir(path, v))
    _commit(path, v, batch_id)
    return v


def append_write(
    spark: SparkSession, df: DataFrame, path: str, batch_id: int | None = None
) -> int:
    """Commit ``df`` as an APPEND-DELTA version: the new directory holds
    only ``df``'s files, and the version's ``_MANIFEST`` lists the parent
    version's full file set plus the new files. Readers of the new
    version scan exactly the manifest; readers of older versions are
    untouched. Commit cost is O(new data) — the shape a continuously
    appended 100 TB table needs, where ``snapshot_write`` per trigger
    would rewrite the world.

    The manifest is written inside the version directory BEFORE the
    pointer swap, so it commits or vanishes atomically with the data."""
    fs = fs_for(path)
    fs.mkdirs(f"{path.rstrip('/')}/{_VERSIONS}")
    parent = current_version(path)
    parent_files = _data_files(path, parent) if parent is not None else []
    v = _next_version(path)
    vdir = _vdir(path, v)
    df.write.mode("error").parquet(vdir)
    own = [
        f"v={v:08d}/{name}"
        for name in fs.listdir(vdir)
        if name.endswith(".parquet") and not name.startswith((".", "_"))
    ]
    fs.write_text(f"{vdir}/{_MANIFEST}", "\n".join(parent_files + own))
    _commit(path, v, batch_id)
    return v


def committed_batch_ids(path: str) -> set[int]:
    """Micro-batch ids whose versions are COMMITTED (in the chain). A
    batch whose directory landed but whose pointer swap didn't is absent
    — replaying it re-commits, which is exactly right."""
    fs = fs_for(path)
    out = set()
    for v in _read_chain(path):
        try:
            out.add(int(fs.read_text(f"{_vdir(path, v)}/{_BATCH}").strip()))
        except FileNotFoundError:
            pass
    return out


def foreach_batch_versioned(path: str, mode: str = "snapshot"):
    """Exactly-once streaming sink: ``writeStream.foreachBatch(...)``
    handler that commits each micro-batch as one atomic version and
    SKIPS batch ids already committed — Structured Streaming replays the
    in-flight micro-batch after a restart, and without an idempotency
    check every restart would duplicate it. The batch-id marker rides
    inside the version directory, so it becomes visible atomically with
    the data at the pointer swap: crash before swap → marker invisible →
    replay re-commits; crash after swap → marker visible → replay
    no-ops. State is the table itself — no side ledger to drift.

    ``mode="snapshot"`` pairs with ``outputMode("complete")`` (each
    trigger's version IS the whole table — e.g. the continuously
    maintained KL-drift / count-state monitors in ``streaming/``);
    ``mode="append"`` pairs with ``outputMode("append")`` and commits
    each trigger as a manifest-lite delta (``append_write``), so the
    per-trigger cost is the new rows, never the table."""
    if mode not in ("snapshot", "append"):
        raise ValueError(f"mode must be 'snapshot' or 'append', got {mode!r}")
    write = snapshot_write if mode == "snapshot" else append_write

    def _fn(df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(path):
            return
        write(df.sparkSession, df, path, batch_id=batch_id)

    return _fn


def read_version(spark: SparkSession, path: str, v: int) -> DataFrame:
    """Read one version: its manifest's file list when it has one
    (append-delta), else its directory (snapshot). Either way the scan
    is over immutable files only."""
    files = _data_files(path, v)  # raises FileNotFoundError if v absent
    vroot = f"{path.rstrip('/')}/{_VERSIONS}"
    if not files:
        # empty version (e.g. an append of zero rows): preserve schema by
        # reading the version directory itself
        return spark.read.parquet(_vdir(path, v))
    return spark.read.parquet(*[f"{vroot}/{rel}" for rel in files])


def read_head(spark: SparkSession, path: str) -> DataFrame:
    """Read the table at its current committed version (one pointer read,
    then immutable files only — snapshot isolation under concurrent
    writes)."""
    head = current_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed version at {path}")
    return read_version(spark, path, head)


def rollback(path: str, v: int) -> int:
    """Truncate the committed chain back to ``v`` — O(1) undo of a bad
    ingest; no data moves, the abandoned versions stay readable (and
    vacuumable) for forensics, and — because the chain is recorded, not
    inferred from directory numbers — they can never re-enter
    ``versions()`` / ``committed_batch_ids()`` when later commits number
    past them."""
    chain = _read_chain(path)
    if v not in chain:
        raise ValueError(f"version {v} is not committed at {path}")
    _write_chain(path, chain[: chain.index(v) + 1])
    return v


def vacuum(path: str, keep: int = 2, grace_seconds: float = 600.0) -> list[int]:
    """Delete version directories not needed by the newest ``keep``
    committed versions. "Needed" includes manifest references: an
    append-delta version keeps every ancestor directory its manifest
    still points into, so vacuum can never break a kept version's read —
    and an ancestor whose DIRECTORY survives also KEEPS its chain entry
    (and with it its batch-id idempotency marker: truncating history for
    versions whose rows still serve through a kept manifest would reopen
    the duplicate-ingest window on a streaming replay).

    Out-of-chain directories (crashed writers, rollback-abandoned
    versions) are reclaimed — but only once they are older than
    ``grace_seconds``: an in-flight writer's version directory is
    out-of-chain by definition until its pointer swap, so without the
    grace window a concurrent vacuum could reclaim a commit that was
    about to land. A directory younger than the window is skipped this
    run and reclaimed by a later one if it never commits. Pass
    ``grace_seconds=0`` only when the table is known quiesced.

    Crash ordering: the truncated chain is committed BEFORE any
    directory is deleted. A crash mid-vacuum therefore leaves harmless
    orphan directories for the next vacuum, never a pointer that
    references deleted versions. Returns the deleted version numbers,
    ascending."""
    import time

    if keep < 1:
        raise ValueError(f"keep must be >= 1 (the head always survives), got {keep}")
    chain = _read_chain(path)
    if not chain:
        return []
    kept = chain[-keep:]
    needed = set(kept)
    for v in kept:
        for rel in _data_files(path, v):
            needed.add(int(rel.split("/", 1)[0][2:]))
    fs = fs_for(path)
    in_chain = set(chain)
    now = time.time()

    def _reclaimable(v: int) -> bool:
        if v in needed:
            return False
        if v in in_chain:
            return True  # committed history beyond keep — never in-flight
        try:
            age = now - fs.getmtime(_vdir(path, v))
        except FileNotFoundError:
            return False
        return age >= grace_seconds

    doomed = [v for v in _list_version_dirs(path) if _reclaimable(v)]
    # history = versions still materialized: chain entries keep their
    # slot (and batch marker) unless their directory is actually deleted
    new_chain = [v for v in chain if v not in doomed]
    if new_chain != chain:
        _write_chain(path, new_chain)  # commit the truncation first…
    for v in doomed:  # …then reclaim storage
        fs.delete(_vdir(path, v))
    return doomed
