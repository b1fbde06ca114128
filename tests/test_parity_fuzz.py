"""Cross-engine parity FUZZER: hypothesis-generated adversarial corpora
(empty/whitespace-only docs, multi-space runs, unicode, punctuation,
digits, duplicated texts) checked Spark-vs-DuckDB with the driver's
compare (order-insensitive value hash over the ARROW fetch path).

Why: the round driver REGENERATES testdata every round, so "green on
today's parquet" proves nothing about tomorrow's — r4's negative-slice
crash and r5's 2-token-doc crash were both latent until data shifted.
This file searches that space deliberately for the whole text family
(tokenization, quality thresholds, md5 fingerprints, bigram zips, span
windows, KL quantization) instead of waiting for the driver to find it.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olap_db_spark.operators.data_selection import DSIR_BOUNDARY_GUARD_SQL
from olap_db_spark.operators.relevance import (
    BIGRAM_BOUNDARY_GUARD_SQL,
    BM25_BOUNDARY_GUARD_SQL,
)
from olap_db_spark.operators.text_analysis import KL_BOUNDARY_GUARD_SQL
from olap_db_spark.registry import all_queries

# Floor-quantized transcendental surfaces → their integer-boundary guard
# SQL (defined NEXT TO each oracle from the same raw-term constant).
_BOUNDARY_GUARDS = {
    "bm25_milli": BM25_BOUNDARY_GUARD_SQL,
    "bigram_micro": BIGRAM_BOUNDARY_GUARD_SQL,
    "domain_kl_nano": KL_BOUNDARY_GUARD_SQL,
    "dsir_micro": DSIR_BOUNDARY_GUARD_SQL,
}

# Alphabet chosen to provoke engine divergence: ascii words, digits,
# punctuation, unicode (accents, CJK, combining chars), and the space
# runs / edge whitespace that stress trim+split symmetry.
_WORDS = st.sampled_from(
    [
        "the", "of", "data", "spark", "a", "b", "w0", "42", "x1y",
        "don't", "a,b", "(paren)", "café", "Ñandú", "中文", "ß",
        "éclair", "MIXED", "__", "...",
    ]
)

_TEXT = st.one_of(
    st.just(""),
    st.just(" "),
    st.just("   "),
    st.lists(_WORDS, min_size=1, max_size=40).map(" ".join),
    # double-space runs + edge whitespace
    st.lists(_WORDS, min_size=2, max_size=10).map("  ".join),
    st.lists(_WORDS, min_size=1, max_size=8).map(
        lambda ws: " " + " ".join(ws) + "  "
    ),
)

_DOC = st.tuples(
    _TEXT,
    st.sampled_from(["en", "es", "fr", "de"]),
    st.sampled_from(["web", "cc", "books"]),
)

_CORPUS = st.lists(_DOC, min_size=1, max_size=12)

# Text-family queries that read ONLY the documents table and exercise
# the divergence-prone machinery: split/trim symmetry, list_distinct,
# stopword lambdas, md5(lower(trim)), zip-sliced bigrams, span windows,
# integer-threshold filters, floor-quantized transcendentals.
_QUERIES = (
    "text_stats_by_lang",
    "text_quality_signals",
    "text_quality_filter",
    "text_lang_id",
    "text_fingerprint",
    "pipeline_corpus_curation",
    "text_bigram_lm_nll",
    "text_domain_kl",
    "dedup_exact",
    "dedup_span_exact",
    "text_dsir_select",
    # round-7 additions — all documents-only, so regenerated-data classes
    # (unicode, empty docs, real duplicates) hit them exactly like the rest
    "dedup_incremental",
    "text_domain_cap",
    "dedup_cluster_best",
    "dedup_lsh_eval",
    # round-8: the verbatim-collapse equivalence (exact-dedup before
    # fuzzy-dedup) must hold on degenerate classes — all-identical
    # corpora, single-doc corpora, <3-token docs with clones
    "dedup_minhash_groups",
)


def _vhash(cols, rows) -> str:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(repr(r[i]) for i in idx) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()


@pytest.mark.parametrize("gname", sorted(_BOUNDARY_GUARDS))
def test_no_boundary_straddlers_on_real_testdata(gname):
    """The same guard, run once against the driver's actual sf0.01 corpus:
    today's data must not contain a term whose floor could flip."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    straddlers = con.sql(_BOUNDARY_GUARDS[gname]).fetchall()
    con.close()
    assert not straddlers, straddlers[:5]


@pytest.fixture(scope="module")
def fuzz_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("parityfuzz")
    return {"spark": spark, "base": base, "n": 0}


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_text_family_parity_on_adversarial_corpora(fuzz_env, corpus):
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = fuzz_env["spark"]
    fuzz_env["n"] += 1
    d = fuzz_env["base"] / f"c{fuzz_env['n']}"
    d.mkdir()
    rows = [
        (i, text, lang, source, len(text))
        for i, (text, lang, source) in enumerate(corpus)
    ]
    # duplicated tail: exercise the dedup groupings with REAL duplicates
    rows += [
        (1000 + i, text, lang, source, len(text))
        for i, (text, lang, source) in enumerate(corpus[: len(corpus) // 2])
    ]
    # single parquet FILE (the driver's testdata layout) — readable by
    # both Spark and DuckDB's read_parquet without a glob
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    qs = all_queries()
    for name in _QUERIES:
        sdf = qs[name].fn(spark, str(d))
        srows = [tuple(r) for r in sdf.collect()]
        tbl = con.sql(qs[name].oracle).arrow()  # driver-like fetch path
        ocols = tbl.column_names
        orows = [tuple(rec[c] for c in ocols) for rec in tbl.to_pylist()]
        assert len(srows) == len(orows), (name, len(srows), len(orows))
        assert _vhash(sdf.columns, srows) == _vhash(ocols, orows), (
            name,
            sorted(srows)[:4],
            sorted(orows)[:4],
        )
    # Boundary guard (round-6 ADVICE): no floor-quantized transcendental
    # term may sit within libm-drift distance (~4 ulp) of an integer
    # boundary — such a datum could flip the floor cross-engine without
    # any hash mismatch HERE, then flap at the driver on regenerated data.
    for gname, gsql in _BOUNDARY_GUARDS.items():
        straddlers = con.sql(gsql).fetchall()
        assert not straddlers, (
            f"{gname}: quantized terms within drift of an integer "
            f"boundary: {straddlers[:5]}"
        )
    con.close()
