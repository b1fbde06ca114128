"""Degenerate-document robustness: 0/1/2/4-token documents must not crash
any text/dedup pipeline (ADVICE round 4: ``slice(ws, 1, size(ws)-k)`` with
a negative length is a runtime error in Spark, latent because generated
testdata happened to contain no short docs — and the driver REGENERATES
testdata every round, so 'green today' proves nothing about tomorrow's
parquet)."""

from __future__ import annotations

import pytest

from olap_db_spark.registry import query_fns

# every query that tokenizes documents into positional n-grams or shingles
_NGRAM_QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_contamination_check",
    "text_bigram_lm_nll",
    "text_bigram_nll_topk",
    "text_bm25_search",
    "text_tfidf_topterms",
    "pipeline_corpus_curation",
    "text_quality_filter",
    # ADVICE round 5: sequence(2, size(sb)) with ONE bigram generates the
    # descending array [2, 1] → element_at(sb, 0) runtime error. 2-token
    # docs must short-circuit the dominant-bigram fold.
    "text_repetition_stats",
    "text_bm25_topk",
    "text_ngram_topk",
    "text_doc_chunking",
)


def test_repetition_stats_two_token_doc(spark, short_doc_dir):
    """The 2-token doc (one bigram) must yield top_bigram_n=1, matching
    the oracle's longest-run semantics — not crash in the fold."""
    fns = query_fns()
    rows = {
        r["doc_id"]: r.asDict()
        for r in fns["text_repetition_stats"](spark, short_doc_dir).collect()
    }
    assert rows[2]["n_bigrams"] == 1 and rows[2]["top_bigram_n"] == 1
    assert rows[1]["n_bigrams"] == 0 and rows[1]["top_bigram_n"] == 0
    assert rows[0]["top_bigram_n"] == 0


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    """A documents table dominated by degenerate docs: empty text, one
    token, two tokens, four tokens (below the 5-gram minimum), plus two
    normal docs so joins/aggregates have something to produce."""
    d = tmp_path_factory.mktemp("shortdocs")
    texts = [
        (0, "", "en", "web"),
        (1, "one", "en", "web"),
        (2, "two words", "en", "web"),
        (3, "just four tokens here", "en", "web"),
        (97 * 1, "a b c d e f g h i j the of and data spark", "en", "web"),
        (
            100,
            "the quick brown fox jumps over the lazy dog near the river "
            "bank with spark data window functions " * 2,
            "en",
            "cc",
        ),
    ]
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _NGRAM_QUERIES)
def test_ngram_query_survives_short_docs(spark, short_doc_dir, name):
    fns = query_fns()
    rows = fns[name](spark, short_doc_dir).collect()  # must not raise
    assert isinstance(rows, list)
