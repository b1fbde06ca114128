"""Semantic invariants for the round-6 additions: integer PageRank and
the per-source KL-divergence monitor (their exactness is oracle-checked;
these assert the MATH means what it claims)."""

from __future__ import annotations

import math

from olap_db_spark.operators.graph import (
    _PR_ITERS,
    _PR_SCALE,
    graph_pagerank_purchases,
)
from olap_db_spark.registry import query_fns

SF = "/root/testdata/sf0.01"


def test_pagerank_ranks_positive_and_bounded(spark):
    """Every returned rank sits in (0.15·S, N·S]: the damping floor
    guarantees ≥ 15% of the base mass, and no node can exceed the whole
    graph's (leak-only) total."""
    rows = graph_pagerank_purchases(spark, SF).collect()
    assert len(rows) == 25
    lo = (15 * _PR_SCALE) // 100
    for r in rows:
        assert r.rank >= lo
        assert r.kind in ("customer", "supplier")
    # top-k must arrive sorted (rank desc, node asc)
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_pagerank_favors_high_degree_suppliers(spark):
    """Suppliers connect to many customers (bipartite hub side), so the
    top of the ranking must contain suppliers — a sanity check that the
    contribution rounds actually propagate mass along edges rather than
    degenerating to the uniform damping floor."""
    rows = graph_pagerank_purchases(spark, SF).collect()
    kinds = {r.kind for r in rows[:10]}
    assert "supplier" in kinds
    # and the best node strictly exceeds the damping floor — mass moved
    assert rows[0].rank > (15 * _PR_SCALE) // 100


def test_pagerank_broadcast_gate_branches(spark):
    """The rank broadcast hint is gated on node count (r6 VERDICT item 5):
    below the threshold the rank side carries an explicit broadcast hint;
    above it the hint is DROPPED (shuffle join over src-partitioned edges).
    Both branches must return identical rows. autoBroadcastJoinThreshold is
    pinned to -1 so the initial plans show the strategy the HINT (not the
    tiny test data) selects."""
    from olap_db_spark.operators.graph import _pagerank_df
    from olap_db_spark.plans.audit import plan_string

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bc = _pagerank_df(spark, SF)
        fb = _pagerank_df(spark, SF, broadcast_max_nodes=0)
        # hinted branch: rank join compiles to a broadcast hash join even
        # with the auto threshold off
        assert "BroadcastHashJoin" in plan_string(bc)
        # gated branch: no broadcast join anywhere above the checkpointed
        # edges — the rank side shuffles instead
        assert "BroadcastHashJoin" not in plan_string(fb)
        assert bc.collect() == fb.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_domain_kl_nonnegative_and_complete(spark):
    """KL divergence is ≥ 0; the nano-quantized sum can undershoot only
    by the per-term floor loss (< 1 nano-unit per term). Every source in
    the table must appear."""
    fns = query_fns()
    rows = fns["text_domain_kl"](spark, SF).collect()
    sources = {
        r.source
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }
    assert {r.source for r in rows} == sources
    for r in rows:
        assert r.n_terms > 0
        # true KL >= 0; quantization loses at most 1 per term
        assert r.kl_nano >= -r.n_terms, (r.source, r.kl_nano, r.n_terms)


def test_domain_kl_detects_injected_skew(spark, tmp_path):
    """A skewed source (one dominant token) must score clearly above the
    uniform source — the drift the monitor exists to flag. Expected
    values (hand-computed): corpus = 1000 uniform + 500 skewed tokens →
    KL(uniform)≈0.33 (the skewed docs pull the corpus away from it too),
    KL(skewed)≈1.04."""
    base = " ".join(f"w{i}" for i in range(50))
    rows = []
    for d in range(20):
        rows.append((d, base, "en", "uniform", len(base)))
    skew = "w0 " * 49 + "w1"
    for d in range(20, 30):
        rows.append((d, skew.strip(), "en", "skewed", len(skew)))
    p = tmp_path / "kl"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(p / "documents.parquet"))
    got = {
        r.source: r.kl_nano / 1e9
        for r in query_fns()["text_domain_kl"](spark, str(p)).collect()
    }
    assert got["skewed"] > got["uniform"] + 0.5, got
    assert 0.0 <= got["uniform"] < 0.5, got
    assert abs(got["uniform"] - 0.333) < 0.02, got
    assert abs(got["skewed"] - 1.037) < 0.02, got


def test_pagerank_fallback_cache_is_call_unique_and_dropped(spark):
    """ADVICE r9 (medium): a FIXED-name edge-cache table let a second
    _pagerank_df call overwrite the table before the first result was
    consumed — silently serving the wrong graph's edges. The fix is a
    call-unique name plus eager rank materialization, after which the
    cache is dropped. Pin both properties: interleaved calls stay
    correct, and no cache table survives the call."""
    from olap_db_spark.operators.graph import _pagerank_df

    a = _pagerank_df(spark, SF, broadcast_max_nodes=0)
    # second fallback call BEFORE a is consumed (the regression ordering)
    b = _pagerank_df(spark, "/root/testdata/sf0.001", broadcast_max_nodes=0)
    expected = _pagerank_df(spark, SF).collect()  # broadcast branch, same sf
    assert a.collect() == expected
    assert b.collect() == _pagerank_df(spark, "/root/testdata/sf0.001").collect()
    leftovers = [
        t.name
        for t in spark.catalog.listTables("olap_pr_cache")
        if t.name.startswith("edges_by_src")
    ]
    assert leftovers == []


def test_delete_managed_location_uri_and_plain(spark, tmp_path):
    """sources._fs.managed_table_location strips Spark's file: warehouse
    scheme (single- and double-slash forms) and delete_managed_location
    removes the directory — the helper graph.py's fallback pre-clean and
    drop route through (r9 VERDICT item 4)."""
    from olap_db_spark.sources._fs import (
        delete_managed_location,
        managed_table_location,
    )

    prev = spark.conf.get("spark.sql.warehouse.dir")
    loc = managed_table_location(spark, "db1", "t1")
    assert loc.endswith("/db1.db/t1") and not loc.startswith("file:")

    class _FakeConf:
        def __init__(self, wh):
            self._wh = wh

        def get(self, key, default=None):
            return self._wh if key == "spark.sql.warehouse.dir" else default

    class _FakeSpark:
        def __init__(self, wh):
            self.conf = _FakeConf(wh)

    for wh in (f"file:{tmp_path}/wh", f"file://{tmp_path}/wh", f"{tmp_path}/wh"):
        fake = _FakeSpark(wh)
        loc = managed_table_location(fake, "dbx", "tx")
        assert loc == f"{tmp_path}/wh/dbx.db/tx", (wh, loc)
        import os

        os.makedirs(loc, exist_ok=True)
        (tmp_path / "wh" / "dbx.db" / "tx" / "part-0").write_text("x")
        delete_managed_location(fake, "dbx", "tx")
        assert not os.path.exists(loc)
    assert spark.conf.get("spark.sql.warehouse.dir") == prev
