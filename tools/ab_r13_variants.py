"""Pre-optimization (round-12 HEAD @2828024) implementations of the
operators the r13 optimization round touches, reconstructed verbatim for
same-session interleaved A/B timing via tools/ab_time.py
($AB_MODULE=tools.ab_r13_variants). Measurement only — nothing registers.

Old shapes reconstructed here:
- pagerank rank rebuild as SortMergeJoin LeftOuter (no contrib broadcast)
- the k-means consumers' quantize-from-parquet + vecs-to-assignment join
  (pre-``full=True``): sim_ivf_search / sim_ivf_eval_sampled /
  sim_ivf_refresh / sim_hybrid_rrf_ivf / dedup_semantic
- ivf_route as a row_number window (pre struct-min aggregate)
- the PQ routes without the shared-frame corpus checkpoint
- sim_pq_refresh's double-collect codebook build
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_db_spark.catalog import load
from olap_db_spark.operators._vector import (
    cosine_q,
    dot_q,
    norm2_q,
    quantize,
)
from olap_db_spark.operators.kmeans import kmeans_fit_assign
from olap_db_spark.operators.similarity import (
    _EVAL_SAMPLE_K,
    _ivf_topk,
    _knn_topk,
    _pq_topk,
    _quantized,
    _sampled_ids,
    ivf_refresh_report,
    _REFRESH_COIN_PREFIX,
    _REFRESH_COIN_MOD,
)


def _old_fitted(spark, sf_dir):
    """The pre-r13 upstream shape: quantize re-derived from parquet,
    joined onto the (vec_id, cluster) assignment."""
    q0 = _quantized(load(spark, sf_dir, "embeddings"))
    assigned = kmeans_fit_assign(spark, sf_dir)  # (vec_id, cluster)
    return q0.join(assigned, "vec_id")


def old_sim_ivf_search(spark, sf_dir):
    return _ivf_topk(spark, sf_dir, _old_fitted(spark, sf_dir))


def old_sim_ivf_eval_sampled(spark, sf_dir):
    q0 = _quantized(load(spark, sf_dir, "embeddings"))
    query_pred = F.col("vec_id").isin(_sampled_ids(q0, _EVAL_SAMPLE_K))
    truth = _knn_topk(q0, query_pred).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_t")
    )
    qn_old = q0.join(kmeans_fit_assign(spark, sf_dir), "vec_id")
    ivf = _ivf_topk(spark, sf_dir, qn_old, query_pred).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_i")
    )
    j = truth.join(ivf, ["query_id", "neighbor_id"], "full_outer")
    hit = F.col("in_t").isNotNull() & F.col("in_i").isNotNull()
    lost = F.col("in_t").isNotNull() & F.col("in_i").isNull()
    per = j.groupBy("query_id").agg(
        F.count("in_t").alias("n_truth"),
        F.count("in_i").alias("n_ivf"),
        F.count(F.when(hit, 1)).alias("n_hit"),
        F.count(F.when(lost, 1)).alias("missed"),
    )
    return per.select(
        "query_id",
        "n_truth",
        "n_ivf",
        "n_hit",
        "missed",
        F.expr(
            "CAST(CASE WHEN n_truth = 0 THEN 0"
            " ELSE n_hit * 1000000 DIV n_truth END AS BIGINT)"
        ).alias("recall_micro"),
    )


def _old_ivf_route(newv, cent):
    w_assign = Window.partitionBy("vec_id").orderBy(
        (F.col("cn2") - 2 * dot_q(F.col("qv"), F.col("cv"))).asc(), F.col("cluster")
    )
    return (
        newv.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "qv", "cluster")
    )


def old_sim_ivf_refresh(spark, sf_dir):
    from olap_db_spark.operators.data_selection import _md5_coin

    e = load(spark, sf_dir, "embeddings")
    is_new = (
        _md5_coin(_REFRESH_COIN_PREFIX, F.col("vec_id"), _REFRESH_COIN_MOD) == 0
    )
    allq = e.select(
        "vec_id", quantize(F.col("embedding")).alias("qv"), is_new.alias("is_new")
    )
    base = allq.filter(~F.col("is_new")).select("vec_id", "qv")
    newv = allq.filter(F.col("is_new")).select("vec_id", "qv")
    assigned = kmeans_fit_assign(spark, sf_dir, vecs=base).join(base, "vec_id")
    bpos = assigned.select("cluster", F.posexplode("qv").alias("d", "v"))
    cent = (
        bpos.groupBy("cluster", "d")
        .agg(F.expr("sum(v) DIV count(1)").alias("sv"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("d", "sv"))).alias("ds"))
        .select("cluster", F.transform("ds", lambda s: s["sv"]).alias("cv"))
        .withColumn("cn2", norm2_q(F.col("cv")))
    )
    counts = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_base"))
    nassign = _old_ivf_route(newv, cent)
    return ivf_refresh_report(assigned, cent, counts, nassign)


def old_sim_hybrid_rrf_ivf(spark, sf_dir):
    from olap_db_spark.operators.relevance import (
        _NPROBE_HY,
        _RRF_DEPTH,
        _RRF_QUERY_ID,
        _bm25_lex_top50,
        _rrf_fuse,
    )

    lex = _bm25_lex_top50(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qvecs = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    assigned = kmeans_fit_assign(spark, sf_dir, vecs=qvecs)
    nv = qvecs.join(
        assigned.select("vec_id", "cluster"), "vec_id"
    ).withColumn("n2", norm2_q(F.col("qv")))
    pos = nv.select("cluster", F.posexplode("qv").alias("d", "v"))
    cent = (
        pos.groupBy("cluster", "d")
        .agg(F.expr("sum(v) DIV count(1)").alias("sv"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("d", "sv"))).alias("ds"))
        .select("cluster", F.transform("ds", lambda s: s["sv"]).alias("cv"))
        .withColumn("cn2", norm2_q(F.col("cv")))
    )
    qvec = nv.filter(F.col("vec_id") == _RRF_QUERY_ID).select(
        F.col("qv").alias("qv_q"), F.col("n2").alias("n2_q")
    )
    routed = (
        F.broadcast(qvec)
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "route_cos",
            cosine_q(dot_q(F.col("qv_q"), F.col("cv")), F.col("n2_q"), F.col("cn2")),
        )
        .orderBy(F.col("route_cos").desc(), F.col("cluster").asc())
        .limit(_NPROBE_HY)
        .select(F.col("cluster").alias("probe_cluster"), "qv_q", "n2_q")
    )
    semscore = (
        nv.filter((F.col("vec_id") != _RRF_QUERY_ID) & (F.col("n2") > 0))
        .join(F.broadcast(routed), F.col("cluster") == F.col("probe_cluster"))
        .filter(F.col("n2_q") > 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_q(
                dot_q(F.col("qv"), F.col("qv_q")), F.col("n2"), F.col("n2_q")
            ).alias("cos"),
        )
    )
    w_sem = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
    sem = (
        semscore.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
        .withColumn("r_sem", F.row_number().over(w_sem))
        .select(F.col("doc_id").alias("sem_doc_id"), "r_sem")
    )
    return _rrf_fuse(lex, sem)


def old_dedup_semantic(spark, sf_dir):
    from olap_db_spark.operators.fuzzy_dedup import (
        _DUP_OFFSET,
        _EMB_DIM,
        _SEM_MAX_BLOCK,
        _SEM_PERTURB,
        dedup_semantic as _new_sem,  # noqa: F401 (for the scorer shape)
    )

    e = load(spark, sf_dir, "embeddings")
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
    assigned = kmeans_fit_assign(spark, sf_dir, k="auto", vecs=vecs)
    clustered = vecs.join(assigned, "vec_id")
    sub_w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    clustered = clustered.withColumn(
        "sub",
        F.floor((F.row_number().over(sub_w) - 1) / _SEM_MAX_BLOCK),
    )

    def _make_cluster_scorer():
        def pairs(pdf):
            import numpy as _np
            import pandas as _pd

            ids = pdf["vec_id"].to_numpy()
            q = _np.stack(pdf["qv"].map(_np.asarray).values).astype(_np.int64)
            dots = q @ q.T
            n2 = _np.diag(dots).astype(_np.float64)
            nz = n2 > 0
            ids, dots, n2 = ids[nz], dots[_np.ix_(nz, nz)], n2[nz]
            cos = dots / (_np.sqrt(n2)[:, None] * _np.sqrt(n2)[None, :])
            iu = _np.triu_indices(len(ids), k=1)
            a, b, c = ids[iu[0]], ids[iu[1]], cos[iu]
            lo, hi = _np.minimum(a, b), _np.maximum(a, b)
            keep = c >= 0.95
            cl = int(pdf["cluster"].iloc[0]) if len(pdf) else 0
            return _pd.DataFrame(
                {
                    "cluster": _np.full(int(keep.sum()), cl, dtype=_np.int64),
                    "vec_a": lo[keep],
                    "vec_b": hi[keep],
                    "cos_sim": c[keep],
                }
            )

        return pairs

    return clustered.groupBy("cluster", "sub").applyInPandas(
        _make_cluster_scorer(),
        "cluster LONG, vec_a LONG, vec_b LONG, cos_sim DOUBLE",
    )


def old_sim_pq_search(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    return _pq_topk(spark, q)


def old_sim_pq_eval_sampled(spark, sf_dir):
    from olap_db_spark.operators.similarity import _l2_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    query_pred = F.col("vec_id").isin(_sampled_ids(q, _EVAL_SAMPLE_K))
    truth = _l2_topk(q, query_pred).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_t")
    )
    pq = _pq_topk(spark, q, query_pred).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_p")
    )
    j = truth.join(pq, ["query_id", "neighbor_id"], "full_outer")
    hit = F.col("in_t").isNotNull() & F.col("in_p").isNotNull()
    lost = F.col("in_t").isNotNull() & F.col("in_p").isNull()
    per = j.groupBy("query_id").agg(
        F.count("in_t").alias("n_truth"),
        F.count("in_p").alias("n_pq"),
        F.count(F.when(hit, 1)).alias("n_hit"),
        F.count(F.when(lost, 1)).alias("missed"),
    )
    return per.select(
        "query_id",
        "n_truth",
        "n_pq",
        "n_hit",
        "missed",
        F.expr(
            "CAST(CASE WHEN n_truth = 0 THEN 0"
            " ELSE n_hit * 1000000 DIV n_truth END AS BIGINT)"
        ).alias("recall_micro"),
    )


def old_graph_pagerank(spark, sf_dir):
    """Pre-r13 broadcast-branch iteration: the rank rebuild is a plain
    nodes LEFT JOIN contrib (SortMergeJoin at sf0.1). Copies
    graph._pagerank_df@2828024 verbatim for the broadcast branch."""
    from pyspark import StorageLevel

    from olap_db_spark.operators.graph import (
        _PR_BROADCAST_MAX_NODES,
        _PR_ITERS,
        _PR_SCALE,
        _PR_TOPK,
    )

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges0 = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
        )
    )
    deg = edges0.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = (
        o.select((F.col("o_custkey") * 2).alias("n"))
        .unionAll(li.select((F.col("l_suppkey") * 2 + 1).alias("n")))
        .agg(F.countDistinct("n").alias("c"))
        .collect()[0]["c"]
    )
    assert n_nodes <= _PR_BROADCAST_MAX_NODES, "A/B variant covers the broadcast branch"
    edges = edges0.join(deg, "src").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    rank = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(F.broadcast(rank.withColumnRenamed("node", "src")), "src")
            .select("dst", F.expr("rank DIV deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        rank = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((15 * _PR_SCALE) // 100)
                    + F.expr("(85 * COALESCE(c, 0)) DIV 100")
                ).alias("rank"),
            )
        )
    return (
        rank.select(
            "node",
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("kind"),
            F.expr("(node - node % 2) DIV 2").alias("entity_key"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(_PR_TOPK)
    )


VARIANTS = {
    "old:sim_ivf_search": old_sim_ivf_search,
    "old:sim_ivf_eval_sampled": old_sim_ivf_eval_sampled,
    "old:sim_ivf_refresh": old_sim_ivf_refresh,
    "old:sim_hybrid_rrf_ivf": old_sim_hybrid_rrf_ivf,
    "old:dedup_semantic": old_dedup_semantic,
    "old:sim_pq_search": old_sim_pq_search,
    "old:sim_pq_eval_sampled": old_sim_pq_eval_sampled,
    "old:graph_pagerank_purchases": old_graph_pagerank,
}
