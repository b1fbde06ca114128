"""olap_db_spark — a PySpark-native OLAP analytics engine.

A ground-up re-expression of the capabilities surveyed from
``mhihasan/olap-db`` (see SURVEY.md): wide-fact-table OLAP over columnar
storage, re-architected Spark-first — DataFrames over Parquet, Catalyst/AQE
for optimization, Structured Streaming for the event surface, and
LLM-data-pipeline operators (dedup, similarity, text analysis) designed for
100 TB scale.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, sane shuffle defaults)
- ``catalog``    : register testdata parquet tables as views
- ``operators/`` : relational + data-pipeline operators (each scale-aware)
- ``functions/`` : scalar column-expression libraries (urls, text, dates)
- ``sources/``   : readers (CSV/JSON/JDBC-shape), sinks, idempotent ingest
- ``streaming/`` : event-time windowed aggregation, batch + streaming
- ``plans/``     : plan-inspection helpers (pushdown/broadcast audits)
"""

__version__ = "0.1.0"
