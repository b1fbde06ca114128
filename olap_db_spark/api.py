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

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, load, register_views
from .session import get_spark
from .sources.writers import idempotent_append


class OlapEngine:
    """Session + catalog + the dual SQL/DataFrame query surface."""

    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.spark = spark or get_spark("olap-db-engine")
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)

    # --- query surface ----------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """String-in/DataFrame-out — the reference's `Client.execute`."""
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

    def serve(self, host: str = "127.0.0.1", port: int = 0):
        """Start the HTTP SQL endpoint (the reference's :8123 surface)
        over this engine; returns the started server (``.host``/``.port``
        attributes, ``.stop()`` to shut down)."""
        from .server import HttpSqlServer

        return HttpSqlServer(self, host, port).start()

    # --- ingest surface ---------------------------------------------------
    def ingest(
        self, df: DataFrame, path: str, log_path: str, batch_id: str
    ) -> bool:
        """Idempotent batch append (the FlagDynamoDB-guarded insert,
        /root/reference/ranking_urls_ingestor.py:99-114)."""
        return idempotent_append(self.spark, df, path, log_path, batch_id)
