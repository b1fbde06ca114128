"""Sinks + idempotent ingest — the reference's write surface
(SURVEY.md A9–A14, A41–A43).

The reference bulk-loads CSV into ClickHouse (subprocess `clickhouse-client`
at /root/reference/ingest.py:18, columnar native-TCP inserts at
/root/reference/ranking_urls_ingestor.py:66-79) and tracks ingest-once
flags in DynamoDB (:82-93). Spark-first: appends become Parquet appends,
the `{locale}/{page}/{chunk}` S3 key choreography becomes
``partitionBy``, and the flag store becomes an ingest-log table consulted
with a broadcast anti-join — the same idempotency, minus the second
database.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from olap_db_spark.sources._fs import fs_for


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    """Scope partitionOverwriteMode=dynamic to one write (the
    partition-scoped rewrite paths all need it; the session default must
    not leak)."""
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(conf_key, old)


def _read_parquet_if_exists(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame | None:
    """Read a parquet table, returning None ONLY when it doesn't exist
    yet: path absent, or an existing-but-empty directory (a failed first
    write can leave one — schema inference then raises
    UNABLE_TO_INFER_SCHEMA, which must not wedge ingest forever). Any
    other failure (corrupt footer, permissions) RAISES: swallowing those
    turned transient read errors into silent data loss / duplicate
    ingest in earlier drafts. Pass ``schema`` for known tables — it also
    skips the inference footer scan."""
    reader = spark.read.schema(schema) if schema else spark.read
    try:
        return reader.parquet(path)
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex) or "UNABLE_TO_INFER_SCHEMA" in str(ex):
            return None
        raise


def _stage_and_read(
    spark: SparkSession, df: DataFrame, path: str, suffix: str
) -> tuple[DataFrame, str]:
    """Materialize ``df`` through a sibling staging directory and hand
    back a frame that reads the STAGED copy plus the staging path (the
    caller deletes it when done). This is how every rewrite-in-place
    breaks the read-own-source cycle: a streamed disk stage bounds memory
    at any data size, where a pinned ``localCheckpoint`` unrolls whole
    partition blocks in executor storage (the failure mode the sf100
    probe measured on PageRank's edge table)."""
    staging = path.rstrip("/") + suffix
    df.write.mode("overwrite").parquet(staging)
    return spark.read.parquet(staging), staging


def append_parquet(df: DataFrame, path: str) -> None:
    """A12–A14: append batch. At scale: sized files via AQE coalescing."""
    df.write.mode("append").parquet(path)


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """A11's `{locale}/{page}/{chunk}` layout → directory partitioning;
    readers prune partitions from the path (SURVEY.md §4.2)."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """A9: CSV sink with header."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Columnar sink #2: ORC (zlib), the Hive-ecosystem twin of parquet.
    Same pushdown/pruning contract — predicate pushdown and column
    pruning reach the ORC reader exactly as they do the parquet one
    (asserted in tests/test_sources.py)."""
    df.write.mode("overwrite").option("compression", "zlib").orc(path)


_LOG_SCHEMA = "batch_id STRING"


def idempotent_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    log_path: str,
    batch_id: str,
) -> bool:
    """Ingest-once semantics (A41–A43): skip if ``batch_id`` is already in
    the ingest log; else append data THEN commit the flag (same order as
    the reference: flag write after ingest,
    /root/reference/ranking_urls_ingestor.py:114 — a crash between the two
    re-ingests rather than drops, matching its at-least-once choice).

    Returns True if the batch was written, False if skipped. The log read
    is a metadata-sized scan; at 100 TB the log is a partitioned table and
    the existence probe is a partition-pruned lookup."""
    log = _read_parquet_if_exists(spark, log_path, schema=_LOG_SCHEMA)
    already = (
        log is not None
        and log.filter(F.col("batch_id") == batch_id).limit(1).count() > 0
    )
    if already:
        return False
    df.write.mode("append").parquet(path)
    spark.createDataFrame([(batch_id,)], _LOG_SCHEMA).write.mode("append").parquet(
        log_path
    )
    return True


def upsert_keep_latest(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    key_cols: list[str],
    order_col: str,
) -> None:
    """Merge/upsert with keep-latest semantics — the write-side of
    ClickHouse's ReplacingMergeTree (SURVEY.md §2.3 "argmax-dedup"): union
    existing+incoming, keep the highest ``order_col`` row per key (ties
    broken by the order column only, so supply a unique one), rewrite.

    Plain-Parquet scope: the rewrite is a full overwrite of the table (two
    phases via a staging path since Spark can't overwrite its own input);
    at 100 TB this becomes partition-scoped `replaceWhere` overwrites or a
    table format with MERGE (Delta/Iceberg) — the dedup window logic is
    identical."""
    from pyspark.sql.window import Window

    existing = _read_parquet_if_exists(spark, path)
    unioned = incoming if existing is None else existing.unionByName(incoming)
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    latest = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    staged, staging = _stage_and_read(spark, latest, path, "._staging")
    staged.write.mode("overwrite").parquet(path)
    try:
        fs_for(staging).delete(staging)
    except Exception:  # cleanup is best-effort; the merge itself is done
        pass


def upsert_partition_scoped(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    partition_col: str,
    key_cols: list[str],
    order_col: str,
) -> list:
    """Partition-scoped keep-latest upsert — the `replaceWhere` analog for
    a directory-partitioned Parquet table (the 100 TB form of
    ``upsert_keep_latest``, which rewrites the whole sink).

    Only partitions PRESENT IN ``incoming`` are read (partition-pruned
    scan), merged (keep highest ``order_col`` per key), and atomically
    replaced via dynamic partition overwrite; every other partition's
    files are untouched bytes on disk (asserted by mtime+content in
    tests/test_upsert.py). Assumes keys don't move between partitions —
    the same contract `replaceWhere` imposes.

    Returns the list of replaced partition values."""
    from pyspark.sql.window import Window

    parts = [
        r[0] for r in incoming.select(partition_col).distinct().collect()
    ]
    existing = _read_parquet_if_exists(spark, path)
    if existing is None:
        unioned = incoming
    else:
        # NULL partition values need an explicit isNull arm: isin() never
        # matches NULL, so without it the existing null-partition rows
        # would be dropped while dynamic overwrite still replaces that
        # partition — silent data loss.
        touched = F.col(partition_col).isin(
            [p for p in parts if p is not None]
        )
        if any(p is None for p in parts):
            touched = touched | F.col(partition_col).isNull()
        unioned = existing.filter(touched).unionByName(incoming)
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    merged = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # Materialize through a staging DIRECTORY, not a pinned
    # localCheckpoint: the overwrite below must not read from the path it
    # replaces, and a disk stage bounds memory at any partition size
    # (the checkpoint unroll is what OOM'd PageRank's edge table at the
    # sf100 probe — same class). The stage is an ordinary streamed write.
    latest, staging = _stage_and_read(spark, merged, path, "._upsert_staging")
    with _dynamic_overwrite(spark):
        latest.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    try:
        fs_for(path).delete(staging)
    except Exception:  # cleanup is best-effort; the merge itself is done
        pass
    return parts


def dedup_against_existing(
    spark: SparkSession, incoming: DataFrame, path: str, key_cols: list[str]
) -> DataFrame:
    """Row-level idempotency: anti-join incoming rows against the keys
    already present in the sink (the ingest-log-as-anti-join pattern,
    SURVEY.md A42 Spark mapping). Key columns only are scanned from the
    sink (column pruning)."""
    sink = _read_parquet_if_exists(spark, path)
    if sink is None:
        return incoming
    return incoming.join(sink.select(*key_cols), key_cols, "left_anti")


def delete_where(
    spark: SparkSession,
    path: str,
    partition_col: str,
    predicate: str,
) -> list:
    """Partition-scoped DELETE (the ClickHouse ``ALTER TABLE ... DELETE``
    analog; reference backend surface) for a directory-partitioned Parquet
    table — the GDPR/right-to-erasure shape at 100 TB.

    Partition pruning decides which partitions can possibly hold matching
    rows (the predicate is evaluated once against the distinct partition
    values when it references only the partition column; otherwise every
    partition holding matches is found with one pruned scan). Only those
    partitions are rewritten without the matching rows, via dynamic
    partition overwrite; untouched partitions stay byte-identical on
    disk. Returns the list of rewritten partition values."""
    existing = _read_parquet_if_exists(spark, path)
    if existing is None:
        return []
    cond = F.expr(predicate)
    touched = [
        r[0]
        for r in existing.filter(cond).select(partition_col).distinct().collect()
    ]
    if not touched:
        return []
    in_touched = F.col(partition_col).isin([p for p in touched if p is not None])
    if any(p is None for p in touched):
        in_touched = in_touched | F.col(partition_col).isNull()
    # SQL DELETE removes rows where the predicate is TRUE; rows where it
    # evaluates to NULL must SURVIVE. A bare filter(~cond) drops them
    # (three-valued logic: NOT NULL → NULL → filtered out) — silent data
    # loss for e.g. `value > 100` against a NULL value row sharing a
    # rewritten partition with a match.
    survivors, staging = _stage_and_read(
        spark,
        existing.filter(in_touched).filter(~F.coalesce(cond, F.lit(False))),
        path,
        "._delete_staging",
    )
    # Dynamic overwrite only rewrites partitions PRESENT in the output —
    # a partition whose every row matches the predicate would silently
    # keep its old files. Those are dropped explicitly (the DROP
    # PARTITION analog; on a real cluster this is the same filesystem
    # delete against the partition directory).
    kept = {
        r[0] for r in survivors.select(partition_col).distinct().collect()
    }
    fully_deleted = [p for p in touched if p not in kept]
    with _dynamic_overwrite(spark):
        survivors.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    fs = fs_for(path)
    for p in fully_deleted:
        part_dir = (
            f"{path.rstrip('/')}/{partition_col}="
            + ("__HIVE_DEFAULT_PARTITION__" if p is None else str(p))
        )
        fs.delete(part_dir)
    try:
        fs.delete(staging)
    except Exception:  # cleanup is best-effort; the delete itself is done
        pass
    return touched


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> list:
    """Small-file compaction (the OPTIMIZE / ClickHouse merge analog) for
    a directory-partitioned Parquet table — the table-maintenance job
    every continuously appended 100 TB sink needs: steady
    ``idempotent_append`` / streaming ingest leaves partitions fragmented
    into per-batch files, and a scan's map parallelism + footer overhead
    degrade with file COUNT, not data volume (the round-7 sf10 probe
    measured the dual failure — too FEW row groups — capping a 32-core
    scan at 7 tasks; both are layout repairs, not plan repairs).

    A partition is rewritten only when its file count exceeds
    ``ceil(partition_bytes / target_bytes)`` — the file count its data
    volume actually needs; each rewritten partition is coalesced to
    exactly that many files. Untouched partitions stay byte-identical on
    disk, rows are never changed, and re-running converges: a re-run is a
    no-op unless merging improved compression enough to cross a
    ``target_bytes`` multiple (dictionary pages dedup better in one
    file), in which case at most one more rewrite settles the layout.
    File inventory comes from a driver-side listing — control-plane
    metadata, the same role a table format's manifest plays; one LIST per
    partition prefix, via the local OS for plain paths or the Hadoop
    FileSystem API for URI-schemed ones (``sources/_fs.py``), so
    object-store tables compact with the same code.

    Each rewrite is STAGE-AND-SWAP: the coalesced partition streams into
    a dot-prefixed staging directory (invisible to table scans), then the
    live partition directory is swapped out by two renames. Memory stays
    bounded at any partition size — the rewrite is an ordinary streaming
    write, never a pinned ``localCheckpoint`` of the whole partition —
    and the data files never contain the partition column, so the
    partition directory name (and hence the column's inferred type) is
    untouched. The swap window is two renames; a crash inside it leaves
    the old partition parked in ``.compact_bak``, and the next
    ``compact_partitions`` run RESTORES any partition whose backup exists
    without a live directory before doing new work. Like the dynamic
    partition overwrite it replaces, the swap is not atomic for
    concurrent readers — maintenance jobs run against a quiesced table
    (a table format's commit log is the upgrade for live swaps).

    Returns the list of compacted partition values (as directory-encoded
    strings)."""
    import math

    fs = fs_for(path)
    base = path.rstrip("/")
    if not fs.isdir(base):
        return []
    stage_root = f"{base}/.compact_tmp"
    bak_root = f"{base}/.compact_bak"
    prefix = f"{partition_col}="

    # Crash recovery: a backup without a live partition directory means a
    # prior run died between its two swap renames — restore it first.
    # EVERY parked entry is restored, not just ones matching this call's
    # partition_col: a later run invoked with a different column must not
    # sweep another column's parked partition into the bak-root delete
    # (an entry whose live directory exists is a post-swap leftover and
    # is safe to discard with the root).
    if fs.isdir(bak_root):
        for entry in fs.listdir(bak_root):
            live = f"{base}/{entry}"
            if not fs.exists(live):
                fs.rename(f"{bak_root}/{entry}", live)
        fs.delete(bak_root)
    fs.delete(stage_root)

    todo: list[tuple[str, int]] = []  # (partition value string, want)
    for entry in fs.listdir(base):
        pdir = f"{base}/{entry}"
        if not (entry.startswith(prefix) and fs.isdir(pdir)):
            continue
        files = [
            f"{pdir}/{f}"
            for f in fs.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        total = sum(fs.getsize(f) for f in files)
        want = max(1, math.ceil(total / target_bytes))
        if len(files) > want:
            todo.append((entry, want))
    if not todo:
        return []
    compacted = []
    for entry, want in todo:
        # One pruned scan per fragmented partition; coalesce (not
        # repartition) — no shuffle, readers just concatenate splits. The
        # staged write reads the old files while writing the new ones —
        # distinct directories, so no read-own-source and no pinning.
        live = f"{base}/{entry}"
        staged = f"{stage_root}/{entry}"
        spark.read.parquet(live).coalesce(want).write.mode(
            "error"
        ).parquet(staged)
        fs.delete(f"{staged}/_SUCCESS")
        fs.mkdirs(bak_root)
        fs.rename(live, f"{bak_root}/{entry}")  # swap out…
        fs.rename(staged, live)  # …swap in (crash here → recovery above)
        fs.delete(f"{bak_root}/{entry}")
        compacted.append(entry[len(prefix):])
    fs.delete(stage_root)
    fs.delete(bak_root)
    return compacted
