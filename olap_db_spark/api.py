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
# Read-side time travel (Delta's SELECT ... VERSION AS OF analog, spelled
# as a path-addressed verb like the rest of the maintenance family):
#   READ '<path>' VERSION AS OF n
_READ_VERSION_RE = re.compile(
    r"^\s*READ\s+'(?P<path>[^']+)'"
    r"\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)\s*$",
    re.IGNORECASE,
)

#: statement kinds that mutate data or history at a filesystem path —
#: the set the HTTP server gates behind its explicit opt-in
MUTATING_VERBS = ("UPSERT", "DELETE", "OPTIMIZE", "VACUUM", "RESTORE")


def classify_statement(query: str) -> str | None:
    """The engine-routed verb a statement would take (``"UPSERT"``,
    ``"DELETE"``, ``"OPTIMIZE"``, ``"VACUUM"``, ``"RESTORE"``,
    ``"SHOW_VERSIONS"``, ``"READ_VERSION"``) or None for plain Spark SQL.
    Shared with the HTTP server so its mutation gate matches the routing
    here exactly — a second hand-written matcher would drift."""
    for verb, rx in (
        ("UPSERT", _UPSERT_RE),
        ("DELETE", _DELETE_RE),
        ("OPTIMIZE", _OPTIMIZE_RE),
        ("VACUUM", _VACUUM_RE),
        ("RESTORE", _RESTORE_RE),
        ("SHOW_VERSIONS", _SHOW_VERSIONS_RE),
        ("READ_VERSION", _READ_VERSION_RE),
    ):
        if rx.match(query):
            return verb
    return None


class OlapEngine:
    """Session + catalog + the dual SQL/DataFrame query surface."""

    def __init__(
        self,
        sf_dir: str,
        spark: SparkSession | None = None,
        table_root: str | None = None,
    ):
        """``table_root`` (ADVICE r9): when set, every path-addressed
        statement (UPSERT/DELETE/OPTIMIZE/VACUUM/RESTORE/SHOW VERSIONS/
        READ VERSION) must resolve inside that directory — the engine
        refuses to mutate or read arbitrary filesystem paths handed in
        through SQL strings. None (the default) keeps the embedded-use
        behavior where the caller already holds filesystem authority."""
        self.spark = spark or get_spark("olap-db-engine")
        self.sf_dir = sf_dir
        self.table_root = table_root
        register_views(self.spark, sf_dir)

    def _checked_path(self, path: str) -> str:
        if self.table_root is None:
            return path
        import os.path

        from .sources._fs import is_uri

        if is_uri(self.table_root) or is_uri(path):
            # URI paths have no OS-level normalization; compare as
            # slash-delimited prefixes (".." is not meaningful in the
            # Hadoop Path forms the maintenance surface accepts)
            root = self.table_root.rstrip("/")
            ok = path == root or path.startswith(root + "/")
            ok = ok and "/../" not in path and not path.endswith("/..")
        else:
            root = os.path.abspath(self.table_root)
            resolved = os.path.abspath(path)
            ok = resolved == root or resolved.startswith(root + os.sep)
        if not ok:
            raise PermissionError(
                f"path {path!r} is outside the configured table_root "
                f"{self.table_root!r}"
            )
        return path

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
        - ``READ '<path>' VERSION AS OF n`` →
          :func:`~.sources.versioned.read_version` (read-side time
          travel over the versioned sink — any committed or forensic
          version's rows, not just HEAD).
        """
        m = _UPSERT_RE.match(query)
        if m:
            df = self.spark.sql(m.group("select"))
            keys = [k.strip() for k in m.group("keys").split(",")]
            parts = upsert_partition_scoped(
                self.spark,
                df,
                self._checked_path(m.group("path")),
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
                self.spark, self._checked_path(md.group("path")), md.group("pcol"), md.group("pred")
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
                self.spark, self._checked_path(mo.group("path")), mo.group("pcol"), **kw
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
            deleted = versioned.vacuum(self._checked_path(mv.group("path")), **kw)
            return self.spark.createDataFrame(
                [(int(v),) for v in deleted], "deleted_version long"
            )
        mr = _RESTORE_RE.match(query)
        if mr:
            from .sources import versioned

            v = versioned.rollback(
                self._checked_path(mr.group("path")), int(mr.group("version"))
            )
            return self.spark.createDataFrame(
                [(int(v),)], "restored_version long"
            )
        ms = _SHOW_VERSIONS_RE.match(query)
        if ms:
            from .sources import versioned

            chain = versioned.versions(self._checked_path(ms.group("path")))
            head = chain[-1] if chain else None
            return self.spark.createDataFrame(
                [(int(v), v == head) for v in chain],
                "version long, is_head boolean",
            )
        mt = _READ_VERSION_RE.match(query)
        if mt:
            from .sources import versioned

            return versioned.read_version(
                self.spark, self._checked_path(mt.group("path")), int(mt.group("version"))
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
