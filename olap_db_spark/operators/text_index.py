"""Persisted full-text index — the maintained-table answer to BM25's
corpus statistics (r9 verdict stretch item b).

``text_bm25_topk`` / hybrid retrieval recompute the token stream, doc
lengths, dfs and corpus scalars from the raw documents on every query —
correct, and the right shape for a one-off, but a standing search service
pays that corpus scan per query. This module maintains the statistics as
a parquet INDEX (the ``refresh_daily_rollup`` pattern applied to text):

- ``postings/``     (term, doc_id, tf) — range-partitioned and sorted by
  term, so a query's ``term IN (...)`` predicate prunes row groups via
  parquet min/max stats and reads only its terms' slices;
- ``doc_stats/``    (doc_id, dl) — one row per doc;
- ``corpus_stats/`` (n_docs, dl_sum, dl_n) — one row.

``bm25_topk_from_index`` then scores a query from the index alone: the
documents table is never touched at query time, and the scoring math is
the SAME helper ``relevance._bm25_score_topk`` the from-scratch query
uses (tests/test_materialized.py asserts from-index == from-scratch rows
for several query-term sets).

Freshness: ``refresh_text_index`` skips the rebuild when the recorded
corpus row count matches the live table (the cheap staleness probe — one
column-pruned count). An append-heavy deployment would swap this for the
versioned sink's batch-id chain; the query path is unchanged either way.

Scale shape: the refresh is two hash aggregates over the token stream
(tf per (term, doc), dl per doc) + one scalar reduce — the same passes
the per-query recompute used to pay, amortized across every query until
the next refresh. Query-time cost is O(matching postings): a pruned
index scan, one broadcast of the query terms' dfs, one join onto doc
lengths, one scalar broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .relevance import _bm25_score_topk, _tokens


def _p(index_path: str, part: str) -> str:
    return f"{index_path.rstrip('/')}/{part}"


def refresh_text_index(
    spark: SparkSession, sf_dir: str, index_path: str, force: bool = False
) -> bool:
    """Build or refresh the text index at ``index_path``. Returns True if
    a rebuild ran, False if the index was already current (recorded
    corpus count == live count and ``force`` is not set)."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    if not force:
        try:
            rec = (
                spark.read.parquet(_p(index_path, "corpus_stats"))
                .select("n_docs")
                .collect()
            )
            if rec and rec[0][0] == n_docs:
                return False
        except Exception:  # noqa: BLE001 — first build: no index yet
            pass
    tokens = _tokens(docs)
    tf = tokens.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    # term-sorted layout: range partitioning + in-file sort give every
    # file and row group a tight term min/max, so a query's IN-list scan
    # prunes to its terms' slices
    (
        tf.repartitionByRange(F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(_p(index_path, "postings"))
    )
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dl.write.mode("overwrite").parquet(_p(index_path, "doc_stats"))
    (
        spark.read.parquet(_p(index_path, "doc_stats"))
        .agg(
            F.lit(n_docs).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("dl_sum"),
            F.count(F.lit(1)).alias("dl_n"),
        )
        .write.mode("overwrite")
        .parquet(_p(index_path, "corpus_stats"))
    )
    return True


def refresh_lsh_index(
    spark: SparkSession, docs: DataFrame, index_path: str, force: bool = False
) -> bool:
    """Persist the incremental-dedup LSH index for ``docs`` (any
    (doc_id, text) frame) at ``index_path`` — the durable form of the
    collapsed index ``fuzzy_dedup.lsh_base_index`` builds (one row per
    DISTINCT shingle set: rep doc_id, member count, shingles), which the
    streaming twin otherwise pins in memory per query. Same freshness
    contract as ``refresh_text_index``: skip when the recorded corpus
    row count matches. Returns True when a rebuild ran.

    Scale shape: the index is O(distinct texts) rows; a deployment
    refreshes it on the ingest cadence and every arriving batch assigns
    against the table via ``assign_from_lsh_index`` without re-shingling
    or re-collapsing the corpus."""
    from .fuzzy_dedup import _shingled, lsh_base_index

    n_docs = docs.count()
    if not force:
        try:
            rec = (
                spark.read.parquet(_p(index_path, "meta"))
                .select("n_docs")
                .collect()
            )
            if rec and rec[0][0] == n_docs:
                return False
        except Exception:  # noqa: BLE001 — first build: no index yet
            pass
    lsh_base_index(_shingled(docs)).write.mode("overwrite").parquet(
        _p(index_path, "classes")
    )
    spark.createDataFrame([(n_docs,)], "n_docs long").write.mode(
        "overwrite"
    ).parquet(_p(index_path, "meta"))
    return True


def assign_from_lsh_index(
    spark: SparkSession, index_path: str, new_docs: DataFrame
) -> DataFrame:
    """Assign a batch of (doc_id, text) rows to the near-dup groups of
    the PERSISTED LSH index at ``index_path`` — identical semantics to
    ``fuzzy_dedup.lsh_assign`` over the in-memory index (same shared
    pipeline), with the corpus never touched at assignment time."""
    from .fuzzy_dedup import _shingled, lsh_assign

    base_index = spark.read.parquet(_p(index_path, "classes"))
    return lsh_assign(_shingled(new_docs), base_index)


def bm25_topk_from_index(
    spark: SparkSession, index_path: str, terms: tuple[str, ...], k: int = 10
) -> DataFrame:
    """BM25 top-k for ``terms`` served from the persisted index only —
    the documents table is never read. Identical milli-floor scoring to
    ``text_bm25_topk`` (shared ``_bm25_score_topk`` helper); df is
    derived from the pruned postings slice itself (df(term) = posting
    count), so no separate df table needs maintaining."""
    post = spark.read.parquet(_p(index_path, "postings")).filter(
        F.col("term").isin(*terms)
    )
    tdf = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dstats = spark.read.parquet(_p(index_path, "doc_stats"))
    cstats = spark.read.parquet(_p(index_path, "corpus_stats"))
    full = (
        post.join(F.broadcast(tdf), "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(cstats))
        .select("doc_id", "term", "tf", "df", "dl", "n_docs", "dl_sum", "dl_n")
    )
    return _bm25_score_topk(full, k)
