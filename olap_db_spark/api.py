"""User-facing engine facade — the switch-over surface for a user of the
reference.

The reference's clients hold a connection and issue SQL strings
(clickhouse_driver `Client.execute("SHOW TABLES")` at
/root/reference/drivers/connection_test.py:21-26, aiochclient
`SELECT 1` at /root/reference/drivers/aiochclient_lab.py:11-12) or push
DataFrames (`insert_dataframe`, /root/reference/ranking_urls_ingestor.py:74).
``OlapEngine`` gives the same two entry points over Spark: ``sql()`` for
strings (Catalyst replaces the server-side engine) and ``ingest()`` /
``table()`` for the DataFrame path, with the testdata catalog registered
as the database.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, load, register_views
from .session import get_spark
from .sources.writers import delete_where, idempotent_append, upsert_partition_scoped

# ReplacingMergeTree-analog statement, accepted by ``sql()`` alongside
# standard Spark SQL (ClickHouse's replace-partition / keep-latest merge
# has no ANSI spelling):
#   UPSERT INTO '<path>' PARTITION BY <col> KEY (<c1, c2, ...>)
#     ORDER BY <version_col> SELECT ...
_UPSERT_RE = re.compile(
    r"^\s*UPSERT\s+INTO\s+'(?P<path>[^']+)'"
    r"\s+PARTITION\s+BY\s+(?P<pcol>\w+)"
    r"\s+KEY\s*\((?P<keys>[^)]+)\)"
    r"\s+ORDER\s+BY\s+(?P<ocol>\w+)"
    r"\s+(?P<select>SELECT\b.*)$",
    re.IGNORECASE | re.DOTALL,
)

_INSERT_OVERWRITE_RE = re.compile(r"^\s*INSERT\s+OVERWRITE\b", re.IGNORECASE)

# ALTER TABLE ... DELETE analog (ClickHouse mutation syntax has no ANSI
# spelling for a path-addressed parquet table):
#   DELETE FROM '<path>' PARTITION BY <col> WHERE <predicate>
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+'(?P<path>[^']+)'"
    r"\s+PARTITION\s+BY\s+(?P<pcol>\w+)"
    r"\s+WHERE\s+(?P<pred>.+)$",
    re.IGNORECASE | re.DOTALL,
)

# Table-maintenance statements (r8 verdict stretch item a): the
# compaction / versioned-sink surface, addressable from a remote client
# through the same SQL endpoint that serves queries — spellings follow
# the closest established analog (ClickHouse OPTIMIZE TABLE; Delta
# VACUUM / RESTORE ... VERSION AS OF / DESCRIBE HISTORY).
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+'(?P<path>[^']+)'"
    r"\s+PARTITION\s+BY\s+(?P<pcol>\w+)"
    r"(?:\s+TARGET_BYTES\s+(?P<target>\d+))?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+'(?P<path>[^']+)'"
    r"(?:\s+KEEP\s+(?P<keep>\d+))?"
    r"(?:\s+GRACE\s+(?P<grace>\d+))?\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+'(?P<path>[^']+)'"
    r"\s+TO\s+VERSION\s+(?P<version>\d+)\s*$",
    re.IGNORECASE,
)
_SHOW_VERSIONS_RE = re.compile(
    r"^\s*SHOW\s+VERSIONS\s+FROM\s+'(?P<path>[^']+)'\s*$", re.IGNORECASE
)


class OlapEngine:
    """Session + catalog + the dual SQL/DataFrame query surface."""

    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.spark = spark or get_spark("olap-db-engine")
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)

    # --- query surface ----------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """String-in/DataFrame-out — the reference's `Client.execute`.

        Two write statements get engine-level routing on top of plain
        ``spark.sql``:

        - ``UPSERT INTO '<path>' PARTITION BY p KEY (k...) ORDER BY v
          SELECT ...`` — the ReplacingMergeTree analog: routed to
          :func:`upsert_partition_scoped` (keep-latest merge, only the
          partitions present in the SELECT are rewritten; all other
          partitions stay untouched bytes). Returns one row per replaced
          partition value.
        - ``DELETE FROM '<path>' PARTITION BY p WHERE <pred>`` — the
          ALTER TABLE DELETE analog: routed to :func:`delete_where`
          (only partitions holding matches are rewritten; a partition
          left empty is dropped). Returns one row per rewritten
          partition value.
        - ``INSERT OVERWRITE ...`` — executed under dynamic partition
          overwrite mode, so a partitioned INSERT OVERWRITE replaces only
          the partitions the query produces (Spark's static default wipes
          the whole table — never what an OLAP append store wants).

        Table maintenance (same routing, so a remote HTTP client can run
        the whole maintenance surface, not just queries):

        - ``OPTIMIZE '<path>' PARTITION BY p [TARGET_BYTES n]`` →
          :func:`~.sources.writers.compact_partitions` (small-file
          compaction; one row per compacted partition).
        - ``VACUUM '<path>' [KEEP n] [GRACE seconds]`` →
          :func:`~.sources.versioned.vacuum` (one row per deleted
          version).
        - ``RESTORE '<path>' TO VERSION n`` →
          :func:`~.sources.versioned.rollback` (O(1) pointer truncation).
        - ``SHOW VERSIONS FROM '<path>'`` →
          :func:`~.sources.versioned.versions` (committed chain +
          head flag).
        """
        m = _UPSERT_RE.match(query)
        if m:
            df = self.spark.sql(m.group("select"))
            keys = [k.strip() for k in m.group("keys").split(",")]
            parts = upsert_partition_scoped(
                self.spark,
                df,
                m.group("path"),
                m.group("pcol"),
                keys,
                m.group("ocol"),
            )
            return self.spark.createDataFrame(
                [(str(p),) for p in sorted(parts, key=str)],
                "replaced_partition string",
            )
        md = _DELETE_RE.match(query)
        if md:
            parts = delete_where(
                self.spark, md.group("path"), md.group("pcol"), md.group("pred")
            )
            return self.spark.createDataFrame(
                [(str(p),) for p in sorted(parts, key=str)],
                "rewritten_partition string",
            )
        mo = _OPTIMIZE_RE.match(query)
        if mo:
            from .sources.writers import compact_partitions

            kw = (
                {"target_bytes": int(mo.group("target"))}
                if mo.group("target")
                else {}
            )
            parts = compact_partitions(
                self.spark, mo.group("path"), mo.group("pcol"), **kw
            )
            return self.spark.createDataFrame(
                [(str(p),) for p in sorted(parts, key=str)],
                "compacted_partition string",
            )
        mv = _VACUUM_RE.match(query)
        if mv:
            from .sources import versioned

            kw = {}
            if mv.group("keep"):
                kw["keep"] = int(mv.group("keep"))
            if mv.group("grace") is not None:
                kw["grace_seconds"] = float(mv.group("grace"))
            deleted = versioned.vacuum(mv.group("path"), **kw)
            return self.spark.createDataFrame(
                [(int(v),) for v in deleted], "deleted_version long"
            )
        mr = _RESTORE_RE.match(query)
        if mr:
            from .sources import versioned

            v = versioned.rollback(mr.group("path"), int(mr.group("version")))
            return self.spark.createDataFrame(
                [(int(v),)], "restored_version long"
            )
        ms = _SHOW_VERSIONS_RE.match(query)
        if ms:
            from .sources import versioned

            chain = versioned.versions(ms.group("path"))
            head = chain[-1] if chain else None
            return self.spark.createDataFrame(
                [(int(v), v == head) for v in chain],
                "version long, is_head boolean",
            )
        if _INSERT_OVERWRITE_RE.match(query):
            conf_key = "spark.sql.sources.partitionOverwriteMode"
            old = self.spark.conf.get(conf_key, "static")
            self.spark.conf.set(conf_key, "dynamic")
            try:
                return self.spark.sql(query)  # INSERT executes eagerly
            finally:
                self.spark.conf.set(conf_key, old)
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        return load(self.spark, self.sf_dir, name)

    def tables(self) -> list[str]:
        return list(TABLES)

    def is_alive(self) -> bool:
        """`SELECT 1` liveness probe (A53)."""
        return self.sql("SELECT 1").collect()[0][0] == 1

    def serve(self, host: str = "127.0.0.1", port: int = 0, **kw):
        """Start the HTTP SQL endpoint (the reference's :8123 surface)
        over this engine; returns the started server (``.host``/``.port``
        attributes, ``.stop()`` to shut down). Loopback-only unless
        ``allow_external=True``; ``max_rows`` caps rows per response."""
        from .server import HttpSqlServer

        return HttpSqlServer(self, host, port, **kw).start()

    # --- ingest surface ---------------------------------------------------
    def ingest(
        self, df: DataFrame, path: str, log_path: str, batch_id: str
    ) -> bool:
        """Idempotent batch append (the FlagDynamoDB-guarded insert,
        /root/reference/ranking_urls_ingestor.py:99-114)."""
        return idempotent_append(self.spark, df, path, log_path, batch_id)
