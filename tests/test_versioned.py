"""Versioned parquet sink: atomic-HEAD commit semantics — snapshot
isolation, O(1) rollback, bounded storage via vacuum, crash-orphan
handling. Version directories must be IMMUTABLE (byte-identical across
later commits): that is the whole contract."""

from __future__ import annotations

import glob
import os

import pytest

from olap_db_spark.sources import versioned as V


def _state(path: str) -> dict[str, tuple[float, int]]:
    out = {}
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        st = os.stat(f)
        out[f] = (st.st_mtime, st.st_size)
    return out


def _rows(df):
    return {(r["k"], r["val"]) for r in df.collect()}


def test_commit_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    d1 = spark.createDataFrame([(k, "a") for k in range(10)], "k INT, val STRING")
    d2 = spark.createDataFrame([(k, "b") for k in range(5)], "k INT, val STRING")
    assert V.current_version(path) is None
    assert V.snapshot_write(spark, d1, path) == 1
    assert V.snapshot_write(spark, d2, path) == 2
    assert V.current_version(path) == 2
    assert V.versions(path) == [1, 2]
    assert _rows(V.read_head(spark, path)) == _rows(d2)
    assert _rows(V.read_version(spark, path, 1)) == _rows(d1)


def test_commit_never_mutates_prior_versions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    V.snapshot_write(
        spark,
        spark.createDataFrame([(1, "a")], "k INT, val STRING"),
        path,
    )
    before = _state(path)
    # a reader holding the old snapshot across a concurrent commit
    old_head = V.read_head(spark, path)
    V.snapshot_write(
        spark,
        spark.createDataFrame([(2, "b")], "k INT, val STRING"),
        path,
    )
    v1_files = {f: s for f, s in _state(path).items() if "v=00000001" in f}
    assert v1_files == {f: s for f, s in before.items() if "v=00000001" in f}
    # snapshot isolation: the pre-commit DataFrame still serves v1 rows
    assert _rows(old_head) == {(1, "a")}


def test_rollback_is_pointer_only(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for val in ("a", "b", "c"):
        V.snapshot_write(
            spark,
            spark.createDataFrame([(1, val)], "k INT, val STRING"),
            path,
        )
    before = _state(path)
    assert V.rollback(path, 1) == 1
    assert _state(path) == before, "rollback moved data"
    assert _rows(V.read_head(spark, path)) == {(1, "a")}
    # the abandoned version stays readable for forensics
    assert _rows(V.read_version(spark, path, 3)) == {(1, "c")}
    with pytest.raises(ValueError, match="not committed"):
        V.rollback(path, 99)
    # committing after a rollback numbers ABOVE every existing directory
    # (HEAD+1 would collide with the abandoned v=2)
    v = V.snapshot_write(
        spark, spark.createDataFrame([(1, "d")], "k INT, val STRING"), path
    )
    assert v == 4
    assert _rows(V.read_head(spark, path)) == {(1, "d")}


def test_vacuum_bounds_storage_keeps_head(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for val in ("a", "b", "c", "d"):
        V.snapshot_write(
            spark,
            spark.createDataFrame([(1, val)], "k INT, val STRING"),
            path,
        )
    assert V.vacuum(path, keep=2) == [1, 2]
    assert V.versions(path) == [3, 4]
    assert _rows(V.read_head(spark, path)) == {(1, "d")}
    # after a rollback, the abandoned above-HEAD version is outside
    # current history: readable for forensics until vacuum reclaims it;
    # HEAD itself always survives
    V.rollback(path, 3)
    assert _rows(V.read_version(spark, path, 4)) == {(1, "d")}
    assert V.vacuum(path, keep=1, grace_seconds=0) == [4]
    assert V.versions(path) == [3]
    assert _rows(V.read_head(spark, path)) == {(1, "c")}


def test_crash_orphan_excluded_and_vacuumed(spark, tmp_path):
    path = str(tmp_path / "tbl")
    V.snapshot_write(
        spark, spark.createDataFrame([(1, "a")], "k INT, val STRING"), path
    )
    # simulate a crashed writer: data landed, HEAD swap never happened
    orphan = os.path.join(path, "_versions", "v=00000002")
    spark.createDataFrame([(9, "x")], "k INT, val STRING").write.parquet(orphan)
    assert V.versions(path) == [1], "orphan counted as committed"
    assert _rows(V.read_head(spark, path)) == {(1, "a")}
    assert V.vacuum(path, keep=1, grace_seconds=0) == [2], "orphan not cleaned"


def test_rolled_back_versions_never_reenter_history(spark, tmp_path):
    """The pointer file records the committed CHAIN, so versions abandoned
    by a rollback stay out of versions()/committed_batch_ids()/vacuum's
    keep-window even after later commits number past them — the
    'commit is the pointer swap / rollback rewrites history' invariant."""
    path = str(tmp_path / "tbl")
    for i, val in enumerate(("a", "b", "c")):
        V.snapshot_write(
            spark,
            spark.createDataFrame([(1, val)], "k INT, val STRING"),
            path,
            batch_id=i,
        )
    V.rollback(path, 1)
    v = V.snapshot_write(
        spark,
        spark.createDataFrame([(1, "d")], "k INT, val STRING"),
        path,
        batch_id=9,
    )
    assert v == 4, "new commit must number above the abandoned directories"
    # v2/v3 must NOT reappear now that HEAD (4) is past them
    assert V.versions(path) == [1, 4]
    assert V.committed_batch_ids(path) == {0, 9}, (
        "abandoned versions' batch markers re-entered history"
    )
    # vacuum's keep-window counts committed history only: keep=2 keeps
    # {1, 4} and reclaims the abandoned 2 and 3
    assert V.vacuum(path, keep=2, grace_seconds=0) == [2, 3]
    assert V.versions(path) == [1, 4]
    assert _rows(V.read_head(spark, path)) == {(1, "d")}


def test_crashed_writer_batch_marker_stays_invisible(spark, tmp_path):
    """A pre-swap crash leaves a version directory WITH a batch marker;
    later commits numbering past it must not make that marker visible —
    else a streaming replay of the crashed batch would wrongly no-op."""
    import os as _os

    path = str(tmp_path / "tbl")
    V.snapshot_write(
        spark,
        spark.createDataFrame([(1, "a")], "k INT, val STRING"),
        path,
        batch_id=0,
    )
    # simulate: batch 1's directory + marker landed, pointer swap didn't
    orphan = _os.path.join(path, "_versions", "v=00000002")
    spark.createDataFrame([(9, "x")], "k INT, val STRING").write.parquet(orphan)
    with open(_os.path.join(orphan, "_SPARK_BATCH"), "w") as fh:
        fh.write("1")
    V.snapshot_write(
        spark,
        spark.createDataFrame([(1, "c")], "k INT, val STRING"),
        path,
        batch_id=2,
    )
    assert V.committed_batch_ids(path) == {0, 2}, (
        "crashed writer's batch marker became visible"
    )
    # so the exactly-once handler correctly REPLAYS batch 1
    fn = V.foreach_batch_versioned(path)
    fn(spark.createDataFrame([(1, "b")], "k INT, val STRING"), 1)
    assert V.committed_batch_ids(path) == {0, 1, 2}


def test_vacuum_crash_leaves_pointer_consistent(spark, tmp_path, monkeypatch):
    """vacuum commits the truncated chain BEFORE deleting directories, so
    a crash mid-delete leaves the pointer referencing only live versions
    (the un-deleted doomed directories become orphans for the next run)
    — never a history entry whose data is gone."""
    from olap_db_spark.sources import _fs

    path = str(tmp_path / "tbl")
    for i, val in enumerate(("a", "b", "c", "d")):
        V.snapshot_write(
            spark,
            spark.createDataFrame([(1, val)], "k INT, val STRING"),
            path,
            batch_id=i,
        )
    orig = _fs._LocalFS.delete
    calls = {"n": 0}

    def boom(self, p):
        calls["n"] += 1
        orig(self, p)
        if calls["n"] == 1:
            raise RuntimeError("simulated crash mid-vacuum")

    monkeypatch.setattr(_fs._LocalFS, "delete", boom)
    with pytest.raises(RuntimeError, match="mid-vacuum"):
        V.vacuum(path, keep=2)
    monkeypatch.undo()
    # the pointer was truncated first: every advertised version reads,
    # and the batch markers match the surviving history exactly
    assert V.versions(path) == [3, 4]
    for v in V.versions(path):
        V.read_version(spark, path, v).collect()
    assert V.committed_batch_ids(path) == {2, 3}
    # v1 died pre-crash, v2 survived as an orphan; the next vacuum reclaims it
    assert V.vacuum(path, keep=2, grace_seconds=0) == [2]


def test_vacuum_keep_must_be_positive(spark, tmp_path):
    path = str(tmp_path / "tbl")
    V.snapshot_write(
        spark, spark.createDataFrame([(1, "a")], "k INT, val STRING"), path
    )
    with pytest.raises(ValueError, match="keep must be >= 1"):
        V.vacuum(path, keep=0)


def test_append_delta_versions(spark, tmp_path):
    """append_write: each version's directory holds only the NEW files;
    its manifest makes the version read cumulative; older versions stay
    byte-identical; vacuum keeps ancestor directories a kept manifest
    still references."""
    path = str(tmp_path / "tbl")
    for v, val in enumerate(("a", "b", "c"), start=1):
        got = V.append_write(
            spark,
            spark.createDataFrame([(v, val)], "k INT, val STRING"),
            path,
        )
        assert got == v
    assert V.versions(path) == [1, 2, 3]
    # cumulative reads: version N serves the first N appends
    assert _rows(V.read_version(spark, path, 2)) == {(1, "a"), (2, "b")}
    assert _rows(V.read_head(spark, path)) == {(1, "a"), (2, "b"), (3, "c")}
    before = _state(path)
    V.append_write(
        spark, spark.createDataFrame([(4, "d")], "k INT, val STRING"), path
    )
    v3_files = {f: s for f, s in _state(path).items() if "v=00000003" in f}
    assert v3_files == {f: s for f, s in before.items() if "v=00000003" in f}
    # vacuum(keep=1) keeps HEAD=4 — whose manifest references v1..v4's
    # directories — so NOTHING is deletable, the head still reads whole,
    # and the chain keeps every still-materialized version: truncating
    # history for versions whose rows still serve through the kept
    # manifest would also drop their batch-id idempotency markers and
    # reopen the duplicate-ingest window on a streaming replay.
    assert V.vacuum(path, keep=1) == []
    assert _rows(V.read_head(spark, path)) == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    }
    assert V.versions(path) == [1, 2, 3, 4], (
        "vacuum truncated history for versions it did not delete"
    )
    # a snapshot rewrite (e.g. a compaction job) breaks the ancestry:
    # the next vacuum reclaims every no-longer-referenced delta directory
    # (and only then drops them from history)
    V.snapshot_write(spark, V.read_head(spark, path), path)
    assert V.vacuum(path, keep=1) == [1, 2, 3, 4]
    assert V.versions(path) == [5]
    assert _rows(V.read_head(spark, path)) == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    }


def test_vacuum_preserves_batch_markers_of_surviving_versions(spark, tmp_path):
    """Append-mode exactly-once across vacuum: versions pinned by a kept
    manifest keep their chain slot and batch marker, so a replayed old
    batch id still no-ops after vacuum."""
    path = str(tmp_path / "tbl")
    fn = V.foreach_batch_versioned(path, mode="append")
    for bid in range(4):
        fn(spark.createDataFrame([(bid, "x")], "k INT, val STRING"), bid)
    assert V.vacuum(path, keep=1) == []
    assert V.committed_batch_ids(path) == {0, 1, 2, 3}, (
        "vacuum dropped batch markers for versions whose rows still serve"
    )
    before = _rows(V.read_head(spark, path))
    fn(spark.createDataFrame([(0, "x")], "k INT, val STRING"), 0)  # replay
    assert _rows(V.read_head(spark, path)) == before, "replayed batch re-committed"


def test_streaming_exactly_once_append_mode(spark, tmp_path):
    """foreach_batch_versioned(mode='append'): an append-mode stream
    commits each trigger as a manifest-lite delta — per-trigger cost is
    the new rows, HEAD reads serve the cumulative table, and replaying a
    committed batch id is a no-op."""
    src = tmp_path / "src"
    src.mkdir()
    d1 = spark.createDataFrame([(k, "x") for k in range(5)], "k INT, val STRING")
    d2 = spark.createDataFrame([(k, "y") for k in range(5, 8)], "k INT, val STRING")
    d1.coalesce(1).write.parquet(str(src / "f1.parquet"))
    d2.coalesce(1).write.parquet(str(src / "f2.parquet"))

    tbl = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("k INT, val STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(V.foreach_batch_versioned(tbl, mode="append"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert _rows(V.read_head(spark, tbl)) == _rows(d1.unionAll(d2))
    assert len(V.versions(tbl)) == 2, "one delta version per trigger"
    assert V.committed_batch_ids(tbl) == {0, 1}
    # replay → no new version; new batch id → appends on top
    fn = V.foreach_batch_versioned(tbl, mode="append")
    fn(d2, 1)
    assert len(V.versions(tbl)) == 2
    fn(spark.createDataFrame([(99, "z")], "k INT, val STRING"), 7)
    assert _rows(V.read_head(spark, tbl)) == _rows(d1.unionAll(d2)) | {(99, "z")}
    with pytest.raises(ValueError, match="mode must be"):
        V.foreach_batch_versioned(tbl, mode="overwrite")


def test_versioned_sink_on_file_uri(spark, tmp_path):
    """The same commit/rollback/vacuum contracts against a URI-schemed
    path — control-plane operations route through the Hadoop FileSystem
    API (the sandbox's closest object-store stand-in is file://)."""
    path = "file://" + str(tmp_path / "uri_tbl")
    for val in ("a", "b", "c"):
        V.snapshot_write(
            spark,
            spark.createDataFrame([(1, val)], "k INT, val STRING"),
            path,
        )
    assert V.current_version(path) == 3
    assert V.versions(path) == [1, 2, 3]
    assert _rows(V.read_head(spark, path)) == {(1, "c")}
    assert _rows(V.read_version(spark, path, 1)) == {(1, "a")}
    V.rollback(path, 2)
    assert _rows(V.read_head(spark, path)) == {(1, "b")}
    assert V.snapshot_write(
        spark, spark.createDataFrame([(1, "d")], "k INT, val STRING"), path
    ) == 4
    assert V.versions(path) == [1, 2, 4]
    assert V.vacuum(path, keep=1, grace_seconds=0) == [1, 2, 3]
    assert _rows(V.read_head(spark, path)) == {(1, "d")}
    # append-delta over the URI path too (manifest read/write via Hadoop FS)
    V.append_write(
        spark, spark.createDataFrame([(2, "e")], "k INT, val STRING"), path
    )
    assert _rows(V.read_head(spark, path)) == {(1, "d"), (2, "e")}


def test_streaming_exactly_once_complete_mode(spark, tmp_path):
    """foreach_batch_versioned: a complete-mode aggregation commits one
    atomic version per trigger (per-trigger history retained), HEAD ends
    at the batch ground truth, and replaying an already-committed batch
    id is a no-op — the restart-duplication case Structured Streaming
    replays force every real sink to handle."""
    from pyspark.sql import functions as F

    from olap_db_spark.sources.versioned import (
        committed_batch_ids,
        foreach_batch_versioned,
    )

    src = tmp_path / "src"
    src.mkdir()
    d1 = spark.createDataFrame([(k % 3, 1) for k in range(9)], "k INT, one INT")
    d2 = spark.createDataFrame([(k % 3, 1) for k in range(6)], "k INT, one INT")
    d1.coalesce(1).write.parquet(str(src / "f1.parquet"))
    d2.coalesce(1).write.parquet(str(src / "f2.parquet"))

    tbl = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("k INT, one INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(foreach_batch_versioned(tbl))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    head = {(r["k"], r["n"]) for r in V.read_head(spark, tbl).collect()}
    want = {
        (r["k"], r["n"])
        for r in d1.unionAll(d2).groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert head == want
    vs = V.versions(tbl)
    assert len(vs) == 2, "one version per trigger"
    assert committed_batch_ids(tbl) == {0, 1}
    # per-trigger history: the first version holds the single-file state
    v1 = {(r["k"], r["n"]) for r in V.read_version(spark, tbl, vs[0]).collect()}
    assert sum(n for _, n in v1) in (6, 9)

    # replay an already-committed batch id → no new version, head stable
    fn = foreach_batch_versioned(tbl)
    fn(V.read_head(spark, tbl), 1)
    assert V.versions(tbl) == vs
    assert {(r["k"], r["n"]) for r in V.read_head(spark, tbl).collect()} == want
    # a genuinely new batch id commits
    fn(V.read_head(spark, tbl), 7)
    assert len(V.versions(tbl)) == 3
    assert committed_batch_ids(tbl) == {0, 1, 7}


def test_vacuum_grace_protects_inflight_commit(spark, tmp_path):
    """The r8 verdict's sharp edge: vacuum run concurrently with an
    in-flight commit must not reclaim the writer's not-yet-committed
    directory. An in-flight version is out-of-chain by definition until
    its pointer swap, so the grace window (skip young out-of-chain
    directories) is what closes the race."""
    import os as _os

    path = str(tmp_path / "tbl")
    for val in ("a", "b"):
        V.snapshot_write(
            spark, spark.createDataFrame([(1, val)], "k INT, val STRING"), path
        )
    # interleave: writer has landed its directory but not yet swapped the
    # pointer when vacuum runs
    inflight = _os.path.join(path, "_versions", "v=00000003")
    spark.createDataFrame([(1, "c")], "k INT, val STRING").write.parquet(inflight)
    assert V.vacuum(path, keep=1) == [1], (
        "vacuum must reclaim old committed history but spare the young "
        "in-flight directory"
    )
    # the writer's commit completes and serves
    V._commit(path, 3, None)
    assert V.versions(path) == [2, 3]
    assert _rows(V.read_head(spark, path)) == {(1, "c")}
    # a genuinely abandoned orphan IS reclaimed once it ages past the window
    orphan = _os.path.join(path, "_versions", "v=00000004")
    spark.createDataFrame([(9, "x")], "k INT, val STRING").write.parquet(orphan)
    old = V.vacuum(path, keep=2)
    assert old == [], "fresh orphan reclaimed inside the grace window"
    past = 1_000_000
    _os.utime(orphan, (_os.path.getmtime(orphan) - past,) * 2)
    assert V.vacuum(path, keep=2) == [4]


def test_uri_pointer_swap_crash_leaves_recoverable_backup(spark, tmp_path):
    """A URI-path pointer swap parks the old _HEAD at _HEAD.bak before
    renaming the new one in (never delete-then-rename): a crash between
    the park and the rename must leave the committed chain readable via
    the backup — not an uninitialized table whose next commit silently
    restarts history."""
    import os as _os

    local = tmp_path / "uri_tbl"
    path = "file://" + str(local)
    for val in ("a", "b"):
        V.snapshot_write(
            spark, spark.createDataFrame([(1, val)], "k INT, val STRING"), path
        )
    head = local / "_HEAD"
    bak = local / "_HEAD.bak"
    assert not bak.exists(), "successful swap must retire the backup"
    # simulate the crash window: pointer parked aside, new one never landed
    _os.rename(head, bak)
    assert V.versions(path) == [1, 2], "backup fallback lost the chain"
    assert _rows(V.read_head(spark, path)) == {(1, "b")}
    # streaming idempotency survives the window too
    V.snapshot_write(
        spark, spark.createDataFrame([(1, "c")], "k INT, val STRING"), path, batch_id=7
    )
    assert V.versions(path) == [1, 2, 3], "recovery commit discarded history"
    assert V.committed_batch_ids(path) == {7}
    assert head.exists() and not bak.exists(), "commit must retire the backup"


def test_legacy_head_only_pointer_migration(spark, tmp_path):
    """Pointer-format migration (ADVICE r9): an unstamped SINGLE-entry
    pointer is ambiguous between the legacy head-only format and an
    intermediate one-entry chain (e.g. post-vacuum keep=1), so the chain
    adopts ONLY the head — expanding to every directory <= head adopted
    crash orphans and rolled-back versions (and their batch markers,
    no-op'ing a streaming replay: silent data loss). An unstamped
    multi-entry pointer (the intermediate chain format) parses verbatim;
    the first write re-stamps the pointer."""
    path = str(tmp_path / "tbl")
    for i, val in enumerate(("a", "b", "c")):
        V.snapshot_write(
            spark,
            spark.createDataFrame([(1, val)], "k INT, val STRING"),
            path,
            batch_id=i,
        )
    head = tmp_path / "tbl" / "_HEAD"
    # legacy format: the old code wrote only the head number. The head
    # itself (data + batch marker) is adopted; pre-head directories stay
    # on disk (read_version forensics) but out of committed history —
    # crucially, their batch ids are NOT claimed as committed, so a
    # replayed batch re-appends instead of silently no-op'ing.
    head.write_text("3")
    assert V.versions(path) == [3], "single-entry pointer must adopt only the head"
    assert V.committed_batch_ids(path) == {2}
    assert _rows(V.read_version(spark, path, 1)) == {(1, "a")}, "forensic read lost"
    # a rolled-back/orphaned directory <= head must NOT resurrect: build
    # one by writing a 4th version then pointing the single-entry head
    # past it at a fresh 5th version's number
    V.snapshot_write(
        spark, spark.createDataFrame([(1, "d")], "k INT, val STRING"), path, batch_id=9
    )
    head.write_text("4")
    assert V.versions(path) == [4]
    assert V.committed_batch_ids(path) == {9}
    # first write re-stamps the pointer with the explicit chain
    V.snapshot_write(
        spark, spark.createDataFrame([(1, "e")], "k INT, val STRING"), path, batch_id=10
    )
    assert head.read_text().startswith("format=2 "), "write did not re-stamp"
    assert V.versions(path) == [4, 5]
    # intermediate (unstamped chain) format parses verbatim
    head.write_text("1 3")
    assert V.versions(path) == [1, 3]
    assert _rows(V.read_head(spark, path)) == {(1, "c")}
