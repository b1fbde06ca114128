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
    assert V.vacuum(path, keep=1) == [4]
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
    assert V.vacuum(path, keep=1) == [2], "orphan not cleaned"


def test_uri_paths_rejected(spark):
    with pytest.raises(ValueError, match="URI path"):
        V.current_version("s3a://bucket/tbl")
