"""Quality gates for the rows-only north-star operators: the oracle can't
hash-check them, so we assert their *semantics* — recall vs brute force,
dup-pair detection, determinism across partitionings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from olap_db_spark.operators.fuzzy_dedup import (
    _DUP_OFFSET,
    dedup_minhash_lsh,
    dedup_simhash,
)
from olap_db_spark.operators.similarity import sim_ann_lsh, sim_knn_bruteforce

SF = "/root/testdata/sf0.001"


def test_simhash_finds_exact_dups(spark):
    """Every unperturbed dup pair (id, id+offset) must surface at hamming 0."""
    rows = dedup_simhash(spark, SF).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    # unperturbed copies: doc_id % 10 != 0
    expected = [(i, i + _DUP_OFFSET) for i in range(1, 100) if i % 10 != 0]
    missing = [p for p in expected if p not in pairs]
    assert not missing, f"simhash missed exact dups: {missing[:5]}"
    assert all(pairs[p] == 0 for p in expected if p in pairs)


def test_minhash_finds_exact_dups(spark):
    rows = dedup_minhash_lsh(spark, SF).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    expected = {(i, i + _DUP_OFFSET) for i in range(1, 100) if i % 10 != 0}
    missing = expected - got
    assert not missing, f"minhash missed exact dups: {sorted(missing)[:5]}"
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert all(jac[p] == 1.0 for p in expected)


def test_ann_lsh_recall_vs_bruteforce(spark):
    """LSH ANN must recover ≥ 0.6 of the exact top-5 neighbors (12-bit
    buckets at sf0.001 are coarse; exactness is the brute-force path)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_knn_bruteforce(spark, SF).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in sim_ann_lsh(spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"ANN recall too low: {recall:.2f}"


def test_ivf_kmeans_search_recall(spark):
    """K-means-routed IVF (nprobe=4 of k=16) must recover ≥ 0.6 of the
    exact brute-force top-5 — the round-2 wiring of kmeans_fit_assign
    into sim_ivf_search (arbitrary `label` routing measured ~0.2–0.3)."""
    from olap_db_spark.operators.similarity import sim_ivf_search

    sf = "/root/testdata/sf0.01"
    bf: dict[int, set[int]] = {}
    for r in sim_knn_bruteforce(spark, sf).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf: dict[int, set[int]] = {}
    for r in sim_ivf_search(spark, sf).collect():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(bf[q] & ivf.get(q, set())) / len(bf[q]) for q in bf]
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.6, f"k-means IVF recall too low: {mean:.2f} ({recalls})"


def test_ivf_eval_identities_and_recall(spark):
    """sim_ivf_eval contract: both routes return exactly K rows per query
    (n_truth == n_ivf == 5), the counts satisfy n_hit + missed == n_truth,
    recall_micro is the truncating-DIV micro ratio, the per-query recalls
    agree with an independently computed set intersection of the two
    registered routes, and the measured mean recall stays at the ≥ 0.6
    floor the recall tests have asserted since round 2."""
    from olap_db_spark.operators.similarity import sim_ivf_eval, sim_ivf_search

    sf = "/root/testdata/sf0.01"
    rows = {r["query_id"]: r for r in sim_ivf_eval(spark, sf).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for q, r in rows.items():
        assert r["n_truth"] == 5 and r["n_ivf"] == 5, r
        assert r["n_hit"] + r["missed"] == r["n_truth"], r
        assert r["recall_micro"] == r["n_hit"] * 1_000_000 // r["n_truth"], r
    # cross-check against the independently composed routes
    bf: dict[int, set[int]] = {}
    for r in sim_knn_bruteforce(spark, sf).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf: dict[int, set[int]] = {}
    for r in sim_ivf_search(spark, sf).collect():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q in bf:
        assert rows[q]["n_hit"] == len(bf[q] & ivf.get(q, set())), q
    mean = sum(r["recall_micro"] for r in rows.values()) / len(rows) / 1e6
    assert mean >= 0.6, f"measured IVF recall too low: {mean:.2f}"


def test_pq_eval_identities_and_recall(spark):
    """sim_pq_eval contract: exactly K rows per route per query, count
    identities hold, per-query hits agree with an independent set
    intersection of the registered PQ route vs the exact-L2 truth helper,
    and the measured mean recall stays at the ≥ 0.6 floor."""
    from olap_db_spark.operators.similarity import (
        _l2_topk,
        _quantized,
        sim_pq_eval,
        sim_pq_search,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r["query_id"]: r for r in sim_pq_eval(spark, sf).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for r in rows.values():
        assert r["n_truth"] == 5 and r["n_pq"] == 5, r
        assert r["n_hit"] + r["missed"] == r["n_truth"], r
        assert r["recall_micro"] == r["n_hit"] * 1_000_000 // r["n_truth"], r
    from olap_db_spark.catalog import load as _load

    truth: dict[int, set[int]] = {}
    q0 = _quantized(_load(spark, sf, "embeddings")).select("vec_id", "qv")
    for r in _l2_topk(q0).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    pq: dict[int, set[int]] = {}
    for r in sim_pq_search(spark, sf).collect():
        pq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q in truth:
        assert rows[q]["n_hit"] == len(truth[q] & pq.get(q, set())), q
    mean = sum(r["recall_micro"] for r in rows.values()) / len(rows) / 1e6
    assert mean >= 0.6, f"measured PQ recall too low: {mean:.2f}"


def test_pq_search_recall_vs_exact_l2(spark, duck):
    """PQ ADC shortlist (50) + exact re-rank recovers ≥ 0.6 of the exact
    L2 top-5 (the metric PQ approximates; duck computes ground truth)."""
    import numpy as np

    from olap_db_spark.operators.similarity import sim_pq_search

    sf = "/root/testdata/sf0.01"
    rows = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array(
        [np.round(np.array(r[1], dtype=np.float64) * 1e6) for r in rows]
    ).astype(np.int64)
    got: dict[int, set[int]] = {}
    for r in sim_pq_search(spark, sf).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for qi in range(len(ids)):
        if ids[qi] >= 5:
            continue
        qd = ((V[qi].astype(np.float64)[None, :] - V.astype(np.float64)) ** 2).sum(
            axis=1
        )
        qd[qi] = np.inf
        exact = set(ids[np.argsort(qd, kind="stable")[:5]].tolist())
        recalls.append(len(exact & got.get(ids[qi], set())) / 5)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.6, f"PQ recall too low: {mean:.2f} ({recalls})"


def test_mm_real_bmp_decode_roundtrip(spark):
    """The BMP decoder parses REAL bytes: known doc → exact pixel stats;
    and the payload is a structurally valid BMP (magic, size, offset)."""
    import struct

    from olap_db_spark.operators.multimodal_ops import (
        _BMP_H,
        _BMP_W,
        _make_bmp_synth,
        mm_real_decode_stats,
    )
    from pyspark.sql import functions as F

    row = (
        mm_real_decode_stats(spark, SF).filter(F.col("doc_id") == 7).collect()[0]
    )
    lums = [
        (7 * 31 + x * 7 + y * 13) % 256
        for x in range(_BMP_W)
        for y in range(_BMP_H)
    ]
    assert (row["width"], row["height"]) == (_BMP_W, _BMP_H)
    assert row["lum_min"] == min(lums) and row["lum_max"] == max(lums)
    assert abs(row["lum_mean"] - sum(lums) / len(lums)) < 1e-12
    # structural validity of the synthesized payload
    buf = bytes(
        spark.range(7, 8)
        .select(_make_bmp_synth()(F.col("id")).alias("p"))
        .collect()[0]["p"]
    )
    assert buf[:2] == b"BM"
    (size,) = struct.unpack_from("<I", buf, 2)
    (off,) = struct.unpack_from("<I", buf, 10)
    assert size == len(buf) and off == 54


def test_mm_decode_resize_real_roundtrip(spark):
    """mm_decode_resize_stats is REAL end-to-end: the variable-dim BMP
    synth produces structurally valid files, the decoder+resizer recovers
    the exact closed-form block stats for a known doc, and the class
    rollup is partitioning-invariant."""
    from pyspark.sql import functions as F

    from olap_db_spark.catalog import load
    from olap_db_spark.operators.multimodal_ops import (
        _RESIZE_SCHEMA,
        _make_bmp_resize_decoder,
        _make_bmp_synth_vardim,
        _vd_dims,
        mm_decode_resize_stats,
    )

    # closed-form check for one doc: decode+resize must recover the formula
    doc_id = 7
    w, h = _vd_dims(doc_id)
    lum = [
        [(doc_id * 31 + 7 * x + 13 * y) % 256 for x in range(w)]
        for y in range(h)
    ]
    blocks = [
        lum[2 * by][2 * bx]
        + lum[2 * by][2 * bx + 1]
        + lum[2 * by + 1][2 * bx]
        + lum[2 * by + 1][2 * bx + 1]
        for by in range(h // 2)
        for bx in range(w // 2)
    ]
    row = (
        spark.range(doc_id, doc_id + 1)
        .select(
            F.col("id").alias("doc_id"),
            _make_bmp_synth_vardim()(F.col("id")).alias("payload"),
        )
        .mapInPandas(_make_bmp_resize_decoder(), schema=_RESIZE_SCHEMA)
        .collect()[0]
    )
    assert (row["width"], row["height"]) == (w, h)
    assert (row["thumb_w"], row["thumb_h"]) == (w // 2, h // 2)
    assert row["lum_sum"] == sum(sum(r) for r in lum)
    assert (row["tmin"], row["tmax"]) == (min(blocks), max(blocks))

    # partitioning invariance of the registered query
    a = [tuple(r) for r in mm_decode_resize_stats(spark, SF).collect()]
    docs = load(spark, SF, "documents").repartition(7)
    repart = docs.select(
        "doc_id", _make_bmp_synth_vardim()(F.col("doc_id")).alias("payload")
    ).mapInPandas(_make_bmp_resize_decoder(), schema=_RESIZE_SCHEMA)
    b_tot = repart.agg(
        F.count(F.lit(1)).alias("n"), F.sum("lum_sum").alias("s")
    ).collect()[0]
    assert b_tot["n"] == sum(r[1] for r in a)
    assert b_tot["s"] == sum(r[4] for r in a)


def test_approx_count_distinct_accuracy(spark, duck):
    """HLL estimate within 5% of exact — the query now RETURNS the bound
    assertion (within_5pct) plus the exact count, so it is driver-hashable."""
    from olap_db_spark.operators.aggregates import agg_approx_count_distinct

    rows = agg_approx_count_distinct(spark, "/root/testdata/sf0.01").collect()
    exact = dict(
        duck.execute(
            "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert len(rows) == len(exact)
    for r in rows:
        assert r["n_exact"] == exact[r["o_orderstatus"]]
        assert r["within_5pct"] is True, r


def test_components_cluster_dup_pairs(spark):
    """Every Jaccard pair's endpoints must land in the same component;
    unperturbed dups (i, i+offset) cluster with representative == i
    unless i links into a lower-id near-dup cluster."""
    from olap_db_spark.operators.fuzzy_dedup import (
        dedup_components,
        dedup_ngram_jaccard,
    )

    comp = {
        r["doc_id"]: r["component"] for r in dedup_components(spark, SF).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, SF).collect()
    ]
    assert pairs, "no near-dup pairs at sf0.001"
    bad = [(a, b) for a, b in pairs if comp[a] != comp[b]]
    assert not bad, f"pairs split across components: {bad[:5]}"
    keepers = {c for c in comp.values()}
    assert all(comp[k] == k for k in keepers), "component rep not its own label"


def test_semantic_dedup_finds_dup_pairs(spark):
    """SemDeDup contract: every duplicated embedding pair (id, id+offset)
    whose two halves land in the SAME k-means cluster must surface —
    exact copies at cos ≈ 1, perturbed copies (vec_id % 10 == 0) still
    above the 0.95 threshold but strictly below their exact twin's score.
    Cluster-blocking means cross-cluster dup pairs are legitimately
    missed; SemDeDup's guarantee is within-cluster, so the assertion
    conditions on co-clustering (and sanity-checks that blocking misses
    only a minority)."""
    from pyspark.sql import functions as F

    from olap_db_spark.operators._vector import quantize
    from olap_db_spark.operators.fuzzy_dedup import (
        _EMB_DIM,
        _SEM_PERTURB,
        dedup_semantic,
    )
    from olap_db_spark.operators.kmeans import kmeans_fit_assign
    from olap_db_spark.catalog import load

    sf = SF
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in dedup_semantic(spark, sf).collect()
    }
    # rebuild the corpus + assignment exactly as the operator does
    e = load(spark, sf, "embeddings")
    base = e.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    perturbed = F.concat(
        F.array(F.element_at("qv", 1) + F.lit(_SEM_PERTURB)),
        F.slice("qv", 2, _EMB_DIM - 1),
    )
    dup = base.select(
        (F.col("vec_id") + _DUP_OFFSET).alias("vec_id"),
        F.when(F.col("vec_id") % 10 == 0, perturbed)
        .otherwise(F.col("qv"))
        .alias("qv"),
    )
    vecs = base.unionAll(dup)
    cluster_of = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_fit_assign(spark, sf, k="auto", vecs=vecs).collect()
    }
    n_vecs = len(cluster_of) // 2
    co, missed = [], 0
    for i in range(n_vecs):
        if cluster_of[i] == cluster_of[i + _DUP_OFFSET]:
            co.append(i)
        else:
            missed += 1
    # identical vectors assign identically, so only perturbed copies can
    # split clusters — co-clustered dups must dominate
    assert missed <= n_vecs // 10, f"too many split dup pairs: {missed}"
    perturbed_seen = 0
    for i in co:
        key = (i, i + _DUP_OFFSET)
        assert key in pairs, f"co-clustered dup pair missed: {key}"
        assert pairs[key] >= 0.95
        if i % 10 == 0:  # perturbed: STRICTLY below an exact dup's 1.0
            perturbed_seen += 1
            assert pairs[key] < 1.0 - 1e-9, (
                f"perturbed pair {key} scored {pairs[key]} — the "
                "perturbation was silently dropped (an exact dup scores "
                "exactly 1.0)"
            )
    # the strict-inequality check must actually have run on something
    assert perturbed_seen > 0, "no perturbed pair was co-clustered"


def test_hybrid_ivf_semantic_overlap_vs_bruteforce(spark):
    """The IVF-routed hybrid (sim_hybrid_rrf_ivf) is oracle-checked for
    exactness; this asserts its SEMANTIC quality claim — the probed-cell
    top-50 must recover most of the brute-force semantic top-50, so the
    fused top-10 stays close to text_hybrid_rrf's. Lexical lists are
    shared code, hence identical by construction."""
    from olap_db_spark.operators.relevance import (
        sim_hybrid_rrf_ivf,
        text_hybrid_rrf,
    )

    sf = "/root/testdata/sf0.01"
    bf = [r["doc_id"] for r in text_hybrid_rrf(spark, sf).collect()]
    ivf = [r["doc_id"] for r in sim_hybrid_rrf_ivf(spark, sf).collect()]
    assert len(ivf) == 10
    overlap = len(set(bf) & set(ivf)) / len(bf)
    assert overlap >= 0.6, f"fused top-10 overlap too low: {overlap} ({bf} vs {ivf})"


def test_embedding_cosine_tile_invariance(spark):
    """The rank-tiled pair fan-out of dedup_embedding_cosine must emit the
    EXACT pair set of the single-block form at any tile size (the sf1
    scale probe caught the untiled shape at 31x cost for 10x data): force
    a tiny tile so every label block spans many tiles, and assert
    bit-identical output against the default (single-tile-per-label at
    this sf)."""
    import olap_db_spark.operators.fuzzy_dedup as fd

    sf = "/root/testdata/sf0.01"
    base = sorted(tuple(r) for r in fd.dedup_embedding_cosine(spark, sf).collect())
    assert len(base) > 0
    old = fd._EMB_TILE
    fd._EMB_TILE = 16
    try:
        tiled = sorted(
            tuple(r) for r in fd.dedup_embedding_cosine(spark, sf).collect()
        )
    finally:
        fd._EMB_TILE = old
    assert base == tiled


def test_dsir_enriches_target_domain(spark):
    """DSIR's whole point: the selected subset must over-represent the
    target domain relative to its corpus share. src0 is 1/20 of sources
    (~5% of docs); with importance weights sharpening the Gumbel draw,
    the selected 64 should hold several times that share. Deterministic:
    content-addressed noise, fixed corpus."""
    from olap_db_spark.operators.data_selection import (
        _DSIR_K,
        _DSIR_TARGET_SOURCE,
        text_dsir_select,
    )

    sf = "/root/testdata/sf0.01"
    rows = text_dsir_select(spark, sf).collect()
    assert len(rows) == _DSIR_K
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    corpus_share = (
        docs.filter(F.col("source") == _DSIR_TARGET_SOURCE).count() / docs.count()
    )
    sel_share = sum(r["source"] == _DSIR_TARGET_SOURCE for r in rows) / len(rows)
    assert sel_share >= 2 * corpus_share, (sel_share, corpus_share)
    # ... and the score actually drives selection: target-source docs
    # carry systematically higher importance scores than the rest of the
    # selection (E_target[log p_t/p_r] = KL ≥ 0 is the method's premise;
    # individual docs can still go negative on rare-gram buckets)
    tgt = [r["score_micro"] for r in rows if r["source"] == _DSIR_TARGET_SOURCE]
    rest = [r["score_micro"] for r in rows if r["source"] != _DSIR_TARGET_SOURCE]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_cluster_best_is_exact_argmax_over_components(spark):
    """dedup_cluster_best contract: one row per component; the keeper is
    the longest member (ties → lowest doc_id); token accounting is exact
    against an independently computed per-doc token count."""
    from olap_db_spark.operators.fuzzy_dedup import (
        _dup_corpus,
        dedup_cluster_best,
        dedup_components,
    )

    best = {r["component"]: r for r in dedup_cluster_best(spark, SF).collect()}
    toks = {
        r["doc_id"]: r["n"]
        for r in _dup_corpus(spark, SF)
        .select(
            "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n")
        )
        .collect()
    }
    members: dict[int, list[int]] = {}
    for r in dedup_components(spark, SF).collect():
        members.setdefault(r["component"], []).append(r["doc_id"])
    assert best and set(best) == set(members)
    for c, row in best.items():
        ms = members[c]
        mx = max(toks[m] for m in ms)
        assert row["n_members"] == len(ms)
        assert row["best_tokens"] == mx
        assert row["keep_id"] == min(m for m in ms if toks[m] == mx)
        assert row["dropped_tokens"] == sum(toks[m] for m in ms) - mx


def test_minhash_groups_partition_pair_graph(spark):
    """dedup_minhash_groups contract: the group rows are exactly the
    connected components of the registered pair route — every
    dedup_minhash_lsh pair lands inside one group, each group id is its
    member minimum (that member flagged keeper), group_size counts
    members, and no singleton groups exist."""
    from olap_db_spark.operators.fuzzy_dedup import (
        dedup_minhash_groups,
        dedup_minhash_lsh,
    )

    groups: dict[int, int] = {}
    sizes: dict[int, int] = {}
    keepers: set[int] = set()
    for r in dedup_minhash_groups(spark, SF).collect():
        groups[r["doc_id"]] = r["group_id"]
        sizes[r["group_id"]] = r["group_size"]
        if r["is_keeper"]:
            keepers.add(r["doc_id"])
    assert groups, "dup corpus must produce groups"
    # every verified LSH pair is intra-group (CC can only merge further)
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, SF).collect()
    ]
    assert pairs
    for a, b in pairs:
        assert groups[a] == groups[b], (a, b)
    # group id = member min, exactly that member is the keeper
    members: dict[int, list[int]] = {}
    for d, g in groups.items():
        members.setdefault(g, []).append(d)
    for g, ms in members.items():
        assert g == min(ms)
        assert sizes[g] == len(ms)
        assert len(ms) >= 2, "singleton group emitted"
    assert keepers == set(members), "keeper flags must mark the minima"
    # linear-output claim: rows = duplicated docs, never pair count
    assert len(groups) <= 2 * len(pairs)


def test_lsh_eval_identities_and_recall(spark):
    """dedup_lsh_eval contract: the confusion counts partition exactly
    (tp + missed = truth, tp + beyond_blocking = verified) and on the
    synthetic near-identical dup corpus the LSH route recovers ≥ 90% of
    the exact pairs."""
    from olap_db_spark.operators.fuzzy_dedup import dedup_lsh_eval

    rows = dedup_lsh_eval(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["tp"] + r["missed"] == r["n_truth"]
    assert r["tp"] + r["beyond_blocking"] == r["n_verified"]
    assert 0 < r["n_verified"] <= r["n_cand"]
    assert r["n_truth"] > 0
    assert r["recall_micro"] >= 900_000
    assert 0 <= r["cand_precision_micro"] <= 1_000_000


def test_incremental_dedup_mirrors_exact_set_logic(spark):
    """dedup_incremental contract, checked against a full independent
    Python mirror at sf0.001: statuses are exactly what the base-text set
    + batch first-arrival logic dictates, and keep == 1 iff novel."""
    from olap_db_spark.operators.fuzzy_dedup import dedup_incremental

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    # strip(' ') not strip(): F.trim removes ASCII spaces only — a doc
    # ending in '\n' must fingerprint identically in mirror and operator.
    norm = lambda t: t.strip(" ").lower()  # noqa: E731
    base = {norm(t) for t in docs.values()}
    batch = {
        i + _DUP_OFFSET: norm(t + " zq" if i % 10 == 0 else t)
        for i, t in docs.items()
    }
    batch.update(
        {i + 2 * _DUP_OFFSET: norm(t + " zq") for i, t in docs.items() if i % 10 == 0}
    )
    first = {}
    for bid in sorted(batch):
        first.setdefault(batch[bid], bid)
    expected = {
        bid: (
            "dup_of_base"
            if txt in base
            else ("novel" if first[txt] == bid else "dup_in_batch")
        )
        for bid, txt in batch.items()
    }

    rows = dedup_incremental(spark, SF).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert r["status"] == expected[r["doc_id"]], r
        assert r["keep"] == int(r["status"] == "novel"), r


def test_domain_cap_equals_direct_topk(spark):
    """text_domain_cap contract: the salted two-phase result is
    row-identical to the direct per-source top-K computed independently,
    with sequential ranks 1..min(K, |source|)."""
    from olap_db_spark.operators.text_analysis import _CAP_K, text_domain_cap

    toks = [
        (r["source"], r["doc_id"], len(r["text"].strip(" ").split(" ")))
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "doc_id", "text")
        .collect()
    ]
    expected = set()
    by_src: dict[str, list[tuple[str, int, int]]] = {}
    for t in toks:
        by_src.setdefault(t[0], []).append(t)
    for src, rows_ in by_src.items():
        rows_.sort(key=lambda t: (-t[2], t[1]))
        for rnk, t in enumerate(rows_[:_CAP_K], start=1):
            expected.add((src, t[1], t[2], rnk))

    got = {
        (r["source"], r["doc_id"], r["n_tokens"], r["rnk"])
        for r in text_domain_cap(spark, SF).collect()
    }
    assert got == expected


def test_domain_top_k_salt_invariance_on_skew(spark):
    """domain_top_k's row-identity claim, exercised where it matters: a
    skewed corpus (one domain holds ~90% of rows) must produce IDENTICAL
    rows at every salt setting — explicit 1 / 4 / 7 and the derived
    default — including rank ties broken across salt boundaries."""
    from olap_db_spark.operators.text_analysis import (
        _CAP_TARGET_TASK_ROWS,
        domain_top_k,
    )

    rows = []
    # hot.example: 900 docs, many token-count TIES so phase-1 boundaries
    # are adversarial; two cold domains with < K docs each
    for i in range(900):
        rows.append(("hot.example", i, i % 7))
    for i in range(5):
        rows.append(("cold-a", 1000 + i, 100 + i))
    for i in range(3):
        rows.append(("cold-b", 2000 + i, 50))
    d = spark.createDataFrame(
        rows, "source STRING, doc_id LONG, n_tokens LONG"
    )

    def run(salts):
        return {
            (r["source"], r["doc_id"], r["n_tokens"], r["rnk"])
            for r in domain_top_k(d, 10, salts=salts).collect()
        }

    single_window = run(1)  # salts=1 IS the direct single-window form
    assert run(4) == single_window
    assert run(7) == single_window
    assert run(None) == single_window, "derived-salt path diverged"
    # contract sanity on the skewed domain: 10 best with sequential ranks
    hot = sorted(
        (t for t in single_window if t[0] == "hot.example"),
        key=lambda t: t[3],
    )
    assert [t[3] for t in hot] == list(range(1, 11))
    assert all(t[2] == 6 for t in hot), "not the max-token docs"
    assert [t[1] for t in hot] == sorted(t[1] for t in hot), (
        "ties must break by lowest doc_id in rank order"
    )
    # cold domains keep everything, ranks 1..n
    assert sum(1 for t in single_window if t[0] == "cold-a") == 5
    assert sum(1 for t in single_window if t[0] == "cold-b") == 3
    # sizing rule: the derive is ceil(max_domain/target); at 900 rows it
    # must stay 1 (no pointless salting of small data)
    assert math.ceil(900 / _CAP_TARGET_TASK_ROWS) <= 1


def test_minhash_groups_strategy_invariant(spark):
    """Planner-bug guard (found by the r9 sf100 probe): with the rank
    broadcast disabled, the optimizer pushes the verbatim-collapse
    semi-join into the dup-corpus UNION's branches and then (Spark 4.1)
    treats the concatenated union as hash-partitioned — skipping the
    shingle aggregate's exchange and crashing the sort-merge zip (or,
    worse, splitting same-key groups). The explicit repartition in
    dedup_minhash_groups must keep the result identical under BOTH join
    strategies."""
    from olap_db_spark.operators.fuzzy_dedup import dedup_minhash_groups

    sf = "/root/testdata/sf0.001"
    rows_default = sorted(tuple(r) for r in dedup_minhash_groups(spark, sf).collect())
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rows_smj = sorted(tuple(r) for r in dedup_minhash_groups(spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert rows_default == rows_smj
