"""Bounded-error contracts for the float statistics whose EXACT integer
inputs are what the driver hashes (round-5 determinism redesign).

Round 4 proved that quantized transcendentals (``round(ln(x)*1e6)``) are
not hash-portable across engine builds: log/sqrt/division chains drift by
multiple ulps and flip at .5 rounding midpoints. The driver-hashed queries
now emit only the exact integers the scores are pure functions of
(tf/df/dl/N, bigram model counts, correlation moments); THESE tests close
the loop by re-deriving every float statistic from those integers in pure
Python and bounding the engine's float pipeline against it — the
``agg_approx_count_distinct`` pattern applied to scoring functions.
"""

from __future__ import annotations

import math
from fractions import Fraction

from olap_db_spark.operators import aggregates, relevance  # noqa: F401
from olap_db_spark.registry import query_fns

SF_SMOKE = "/root/testdata/sf0.001"

_K1, _B = relevance._K1, relevance._B


def test_bm25_score_rederived_from_integer_postings(spark):
    """text_bm25_topk's milli-quantized scores must match a pure-Python
    BM25 (floor(1000·contrib) per term, summed) computed from
    text_bm25_search's exact integer postings — proving the hashed
    integers uniquely determine the score the user-facing ranked query
    serves, and that quantization costs < 1 milli per term."""
    fns = query_fns()
    postings = fns["text_bm25_search"](spark, SF_SMOKE).collect()
    assert postings, "no postings at sf0.001 — query terms vanished?"
    expected_milli: dict[int, int] = {}
    expected_float: dict[int, float] = {}
    n_terms: dict[int, int] = {}
    for r in postings:
        idf = math.log(
            (r.n_docs - r.df + 0.5) / (r.df + 0.5) + 1.0
        )
        contrib = (
            idf
            * (r.tf * (_K1 + 1.0))
            / (r.tf + _K1 * (1.0 - _B + _B * (r.dl * r.dl_n) / r.dl_sum))
        )
        expected_milli[r.doc_id] = expected_milli.get(
            r.doc_id, 0
        ) + math.floor(contrib * 1000.0)
        expected_float[r.doc_id] = expected_float.get(r.doc_id, 0.0) + contrib
        n_terms[r.doc_id] = n_terms.get(r.doc_id, 0) + 1
    topk = fns["text_bm25_topk"](spark, SF_SMOKE).collect()
    assert 0 < len(topk) <= 10
    for r in topk:
        assert r.doc_id in expected_milli
        # exact integer agreement with the python re-derivation, and the
        # quantized score within n_terms·1e-3 of the unquantized float
        assert r.score_milli == expected_milli[r.doc_id], (
            r.doc_id,
            r.score_milli,
            expected_milli[r.doc_id],
        )
        assert abs(r.score_milli / 1000.0 - expected_float[r.doc_id]) <= (
            n_terms[r.doc_id] * 1e-3
        )
    # the served top-k must BE the k best under the rederived milli
    # scores (ties broken by doc_id, exactly as the query orders)
    want = sorted(
        expected_milli.items(), key=lambda kv: (-kv[1], kv[0])
    )[: len(topk)]
    assert [d for d, _ in want] == [r.doc_id for r in topk]


def test_bigram_nll_rederived_from_integer_aggregates(spark):
    """text_bigram_nll_topk's avg-NLL must agree with a pure-Python
    bigram LM (add-one smoothing) trained on the raw corpus — and the
    hashed integer aggregates (n_bigrams, sum_c2, sum_c1, v) must match
    the same Python model exactly."""
    fns = query_fns()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    toks = {r.doc_id: r.text.strip().split(" ") for r in docs}
    vocab = {w for l in toks.values() for w in l}
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    for l in toks.values():
        for a, b in zip(l, l[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)

    # exact integer aggregates: engine vs Python, NO tolerance
    agg = fns["text_bigram_lm_nll"](spark, SF_SMOKE).collect()
    got = {r.doc_id: (r.n_bigrams, r.sum_c2, r.sum_c1, r.v) for r in agg}
    for doc_id, l in toks.items():
        bgs = list(zip(l, l[1:]))
        if not bgs:
            assert doc_id not in got
            continue
        want = (
            len(bgs),
            sum(c2[bg] for bg in bgs),
            sum(c1[a] for a, _ in bgs),
            v,
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)

    # micro-quantized NLL surface: engine vs Python, exact integers; and
    # the quantized average within 1e-6 + cross-impl ulp of the float NLL
    sum_micro = {
        doc_id: sum(
            math.floor(1e6 * math.log((c2[bg] + 1.0) / (c1[bg[0]] + v)))
            for bg in zip(l, l[1:])
        )
        for doc_id, l in toks.items()
        if len(l) >= 2
    }
    nll = {
        doc_id: -sum(
            math.log((c2[bg] + 1.0) / (c1[bg[0]] + v))
            for bg in zip(l, l[1:])
        )
        / (len(l) - 1)
        for doc_id, l in toks.items()
        if len(l) >= 2
    }
    topk = fns["text_bigram_nll_topk"](spark, SF_SMOKE).collect()
    assert 0 < len(topk) <= 20
    for r in topk:
        assert r.sum_lp_micro == sum_micro[r.doc_id], (
            r.doc_id,
            r.sum_lp_micro,
            sum_micro[r.doc_id],
        )
        quant_avg = -r.sum_lp_micro / 1e6 / r.n_bigrams
        assert abs(quant_avg - nll[r.doc_id]) <= 2e-6
    # the served top-20 must BE the 20 worst under the rederived
    # quantized ranking key sum/n (ascending — most negative mean
    # log-prob first), ties broken by doc_id
    want = sorted(
        sum_micro.items(),
        key=lambda kv: (kv[1] / (len(toks[kv[0]]) - 1), kv[0]),
    )[: len(topk)]
    assert [d for d, _ in want] == [r.doc_id for r in topk]


def test_tfidf_rank_is_exact_rational_and_score_recoverable(spark):
    """The top-3 ranking must equal the EXACT Fraction(tf, df) ordering
    (proving the double division the window sorts on is bit-faithful to
    the rational), and the classical smoothed score tf·ln((N+1)/(df+1))
    must be recoverable from the emitted integers."""
    fns = query_fns()
    rows = fns["text_tfidf_topterms"](spark, SF_SMOKE).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        keys = [(Fraction(r.tf, r.df), r.term) for r in rs]
        for (f1, t1), (f2, t2) in zip(keys, keys[1:]):
            assert f1 > f2 or (f1 == f2 and t1 < t2), (doc_id, keys)
        for r in rs:
            score = r.tf * math.log((r.n_docs + 1.0) / (r.df + 1.0))
            assert math.isfinite(score) and score >= 0.0


def test_corr_covar_from_exact_integer_output(spark, duck):
    """corr/covar evaluated from the emitted exact integers must match
    DuckDB's built-in corr()/covar_pop() on the raw table to 1e-9
    relative — the moments are lossless, only the final float evaluation
    is engine-local."""
    fns = query_fns()
    rows = fns["agg_corr_covar"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) >= 1
    ref = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            """
            SELECT l_returnflag,
                   corr(CAST(ROUND(l_quantity,0) AS BIGINT),
                        CAST(ROUND(l_extendedprice*100,0) AS BIGINT)),
                   covar_pop(CAST(ROUND(l_quantity,0) AS BIGINT),
                             CAST(ROUND(l_extendedprice*100,0) AS BIGINT))
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    }
    for r in rows:
        cov_num, den_q, den_p = int(r.cov_num), int(r.den_q), int(r.den_p)
        corr = cov_num / math.sqrt(den_q * den_p)
        covar_pop = cov_num / (r.n * r.n)
        want_corr, want_cov = ref[r.l_returnflag]
        assert math.isclose(corr, want_corr, rel_tol=1e-6), r.l_returnflag
        assert math.isclose(covar_pop, want_cov, rel_tol=1e-6), r.l_returnflag
        # Cauchy–Schwarz: cov_num² ≤ den_q·den_p, with all integers exact
        assert den_q >= 0 and den_p >= 0 and r.n > 0
        assert cov_num * cov_num <= den_q * den_p
