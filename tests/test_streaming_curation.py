"""Streaming corpus-curation twin vs the batch pipeline (the one
LLM-pipeline operator that had no streaming variant before round 5). The
batch `pipeline_corpus_curation` stages are the ground truth."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_db_spark.catalog import load
from olap_db_spark.functions.text import quality_signals
from olap_db_spark.streaming.curation import curate_stream, stream_documents
from olap_db_spark.streaming.windows import run_available_now

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(f"{SF}/documents.parquet", d / "part-0.parquet")
    return str(d)


def _batch_kept(spark):
    """The batch pipeline's quality->dedup stages (same code path as
    pipeline_corpus_curation, minus the per-lang report)."""
    d = load(spark, SF, "documents")
    sig = quality_signals(F.col("text"))
    quality = d.select(
        "doc_id",
        "lang",
        "text",
        sig["n_tokens"].cast("long").alias("n_tokens"),
        sig["n_uniq"].cast("long").alias("_uniq"),
        sig["stop_hits_en"].cast("long").alias("_stop"),
    ).filter(
        (F.col("n_tokens") >= 30)
        & (F.col("_uniq") * 10 >= F.col("n_tokens") * 3)
        & (F.col("_stop") * 2 <= F.col("n_tokens"))
    )
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    return (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )


def test_streaming_curation_equals_batch(spark, docs_stream_dir):
    rows = run_available_now(
        curate_stream(stream_documents(spark, docs_stream_dir)),
        "t_curation",
        "append",
    )
    got = {(r["doc_id"], r["lang"], r["n_tokens"]) for r in rows}
    want = {
        (r["doc_id"], r["lang"], r["n_tokens"]) for r in _batch_kept(spark).collect()
    }
    assert got == want
    assert got, "stream kept no documents"


def test_streaming_curation_dedups_replays(spark, tmp_path):
    """Replaying the same corpus file twice must not double the kept set —
    the watermarked dedup state absorbs the duplicates."""
    dup_dir = tmp_path / "dup"
    dup_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", dup_dir / "a.parquet")
    shutil.copy(f"{SF}/documents.parquet", dup_dir / "b.parquet")
    rows = run_available_now(
        curate_stream(stream_documents(spark, str(dup_dir))),
        "t_curation_dup",
        "append",
    )
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "duplicates survived the watermark dedup"
    want_n = _batch_kept(spark).count()
    assert len(set(ids)) == want_n


def test_span_dedup_stream_equals_batch_first_arrival(spark, docs_stream_dir):
    """Streaming span dedup == batch ground truth: one row per distinct
    span fingerprint, attributed to ONE of the documents containing that
    span. Within a single micro-batch ``dropDuplicatesWithinWatermark``
    keeps a processing-order-dependent row — not necessarily the min
    doc_id — so the exact winner is NOT asserted (round-6 ADVICE): the
    contract is the fingerprint SET plus winner-membership."""
    from olap_db_spark.streaming.curation import span_dedup_stream

    stream = span_dedup_stream(stream_documents(spark, docs_stream_dir))
    got = {
        (r["fp"], r["doc_id"])
        for r in run_available_now(stream, "span_dedup_stream_test", "append")
    }

    d = load(spark, SF, "documents")
    t = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), " ").alias("ws"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n"),
    ).filter(F.col("n") >= 32)
    spans = t.select(
        "doc_id",
        F.explode(F.expr("sequence(0, n - 32, 16)")).alias("p"),
        "ws",
    ).select(
        "doc_id",
        F.md5(F.array_join(F.expr("slice(ws, p + 1, 32)"), " ")).alias("fp"),
    )
    # exactly one survivor per distinct fingerprint
    assert len(got) == len({fp for fp, _ in got})
    want_fps = {r["fp"] for r in spans.select("fp").distinct().collect()}
    assert {fp for fp, _ in got} == want_fps
    # the kept doc must actually contain the span it won
    members = {
        (r["fp"], r["doc_id"]) for r in spans.select("fp", "doc_id").collect()
    }
    assert got <= members
    assert len(got) > 0


def test_domain_kl_stream_equals_batch(spark, tmp_path):
    """Continuous drift monitoring: replay the documents corpus as TWO
    stream files (forcing cross-micro-batch state merge), evaluate KL over
    the final streamed count state with the SHARED batch evaluator, and
    assert bit-equality with the batch text_domain_kl output."""
    import pyarrow.parquet as pq

    from olap_db_spark.registry import query_fns
    from olap_db_spark.streaming.curation import (
        domain_kl_from_count_state,
        domain_token_counts_stream,
        stream_documents,
    )

    # split the corpus into two files so at least two input splits exist
    src = pq.read_table(f"{SF}/documents.parquet")
    d = tmp_path / "kl_stream"
    d.mkdir()
    half = src.num_rows // 2
    pq.write_table(src.slice(0, half), d / "a.parquet")
    pq.write_table(src.slice(half), d / "b.parquet")

    state_rows = run_available_now(
        domain_token_counts_stream(stream_documents(spark, str(d))),
        "t_domain_kl_state",
        "complete",
    )
    state = spark.createDataFrame(state_rows)
    got = [tuple(r) for r in domain_kl_from_count_state(state).collect()]
    want = [
        tuple(r) for r in query_fns()["text_domain_kl"](spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0


def test_incremental_dedup_stream_equals_batch(spark, tmp_path):
    """Streaming incremental dedup == the batch operator's keep set: the
    SAME synthetic batch (shifted copies, 10% perturbed, second arrivals
    of every perturbed doc) streamed against the base fingerprint table
    must emit one row per novel fingerprint, never a base fingerprint,
    and every winner must be one of that fingerprint's batch arrivals
    (within-micro-batch winner is processing-order dependent — the same
    contract as the span-dedup twin)."""
    from olap_db_spark.operators.fuzzy_dedup import (
        _DUP_OFFSET,
        dedup_incremental,
    )
    from olap_db_spark.streaming.curation import incremental_dedup_stream

    d = load(spark, SF, "documents").select("doc_id", "text", "lang", "source", "n_chars")
    perturbed = F.concat(F.col("text"), F.lit(" zq"))
    batch = d.select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
        F.when(F.col("doc_id") % 10 == 0, perturbed).otherwise(F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    ).unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 2 * _DUP_OFFSET).alias("doc_id"),
            perturbed.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    batch_dir = tmp_path / "incr_batch"
    batch.coalesce(1).write.parquet(str(batch_dir))

    base_fp = d.select(F.md5(F.lower(F.trim(F.col("text")))).alias("fp")).distinct()
    got = {
        (r["fp"], r["doc_id"])
        for r in run_available_now(
            incremental_dedup_stream(
                stream_documents(spark, str(batch_dir)), base_fp
            ),
            "t_incr_dedup",
            "append",
        )
    }

    truth = dedup_incremental(spark, SF).collect()
    novel_fps = {r["fp"] for r in truth if r["status"] == "novel"}
    arrivals: dict[str, set[int]] = {}
    for r in truth:
        if r["status"] != "dup_of_base":
            arrivals.setdefault(r["fp"], set()).add(r["doc_id"])

    assert len(got) == len({fp for fp, _ in got}), "a fingerprint won twice"
    assert {fp for fp, _ in got} == novel_fps
    assert novel_fps, "vacuous: no novel docs in the batch"
    for fp, doc_id in got:
        assert doc_id in arrivals[fp], (fp, doc_id)


def test_lsh_incremental_stream_equals_batch(spark, tmp_path):
    """Streaming twin of FUZZY incremental dedup (r10): arriving docs are
    assigned to the standing base corpus's near-dup groups per
    micro-batch via the SAME lsh_assign pipeline the batch operator runs;
    the union of all exactly-once appended batches equals the batch query
    on the identical base/new split, and replaying a committed batch id
    commits nothing."""
    from olap_db_spark.operators.fuzzy_dedup import (
        _dup_corpus,
        _inc_coin,
        dedup_lsh_incremental,
    )
    from olap_db_spark.sources import versioned as V
    from olap_db_spark.streaming.fuzzy import lsh_incremental_handler

    corpus = _dup_corpus(spark, SF)
    base = corpus.filter(~_inc_coin(F.col("doc_id")))
    new = corpus.filter(_inc_coin(F.col("doc_id")))

    src = tmp_path / "arrivals"
    src.mkdir()
    new.filter("doc_id % 2 = 0").coalesce(1).write.parquet(str(src / "a.parquet"))
    new.filter("doc_id % 2 = 1").coalesce(1).write.parquet(str(src / "b.parquet"))

    results = str(tmp_path / "assigned")
    handler = lsh_incremental_handler(base, results)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(V.versions(results)) == 2, "one results delta per trigger"
    got = sorted(tuple(r) for r in V.read_head(spark, results).collect())
    want = sorted(tuple(r) for r in dedup_lsh_incremental(spark, SF).collect())
    assert got == want, "stream != batch on the identical base/new split"
    assert any(r[1] != r[0] for r in got), "no doc matched a base group"

    # replay of a committed trigger: nothing commits
    handler(new.filter("doc_id % 2 = 1"), 1)
    assert len(V.versions(results)) == 2


def test_lsh_incremental_stream_from_persisted_index(spark, tmp_path):
    """End-to-end streaming dedup over the PERSISTED LSH index table
    (r10 VERDICT stretch a): the handler reads refresh_lsh_index's
    classes table per trigger — stream == batch on the identical
    base/new split, replay commits nothing, and an index refresh between
    triggers is picked up WITHOUT rebuilding the handler or restarting
    the query."""
    from olap_db_spark.operators.fuzzy_dedup import (
        _dup_corpus,
        _inc_coin,
        dedup_lsh_incremental,
    )
    from olap_db_spark.operators.text_index import refresh_lsh_index
    from olap_db_spark.sources import versioned as V
    from olap_db_spark.streaming.fuzzy import lsh_incremental_handler_from_index

    corpus = _dup_corpus(spark, SF)
    base = corpus.filter(~_inc_coin(F.col("doc_id")))
    new = corpus.filter(_inc_coin(F.col("doc_id")))

    idx = str(tmp_path / "lsh_index")
    assert refresh_lsh_index(spark, base, idx) is True

    src = tmp_path / "arrivals"
    src.mkdir()
    new.filter("doc_id % 2 = 0").coalesce(1).write.parquet(str(src / "a.parquet"))
    new.filter("doc_id % 2 = 1").coalesce(1).write.parquet(str(src / "b.parquet"))

    results = str(tmp_path / "assigned")
    handler = lsh_incremental_handler_from_index(idx, results)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(V.versions(results)) == 2, "one results delta per trigger"
    got = sorted(tuple(r) for r in V.read_head(spark, results).collect())
    want = sorted(tuple(r) for r in dedup_lsh_incremental(spark, SF).collect())
    assert got == want, "stream != batch on the identical base/new split"

    # replay of a committed trigger: nothing commits
    handler(new.filter("doc_id % 2 = 1"), 1)
    assert len(V.versions(results)) == 2

    # index refresh between triggers is picked up by the SAME handler:
    # fold the streamed docs into the index, then re-assign a verbatim
    # clone of a doc that previously FOUNDED its own group — it must now
    # match the refreshed index (its own text is in the classes table).
    founder = next(r for r in got if r[1] == r[0])
    assert refresh_lsh_index(spark, corpus, idx) is True
    clone = corpus.filter(F.col("doc_id") == founder[0]).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    handler(clone, 2)
    assert len(V.versions(results)) == 3
    ((new_doc, assigned, n_matches),) = [
        tuple(r)
        for r in V.read_head(spark, results).collect()
        if r["new_doc"] == founder[0] + 10_000_000
    ]
    # against the BASE index the founder matched nothing (it founded its
    # own group); against the refreshed index its verbatim clone matches
    # at least its own class — and joins a group led by a doc no later
    # than the founder (n_matches now counts FULL-corpus class members,
    # so it can exceed the founder's base-only count)
    assert assigned <= founder[0] and assigned != new_doc
    assert n_matches >= 1
