"""Pre-optimization (round-11 HEAD) implementations of the operators the
r12 optimization round touched, reconstructed verbatim for same-session
interleaved A/B timing via tools/ab_time.py ($AB_MODULE=tools.ab_old_variants).

Each variant reuses the package's still-present building blocks (the
two-stage synth/decoder factories are kept in-module as the reference
implementations; the kmeans/IVF/PQ variants copy the exact pre-change
DataFrame code from git HEAD@a332209). Nothing here registers anywhere —
measurement only.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_db_spark.catalog import load
from olap_db_spark.operators import multimodal_ops as mm
from olap_db_spark.operators.kmeans import _K, _ITERS, _assign_udf
from olap_db_spark.operators._vector import (
    cosine_q,
    dot_q,
    norm2_q,
    quantize,
)
from olap_db_spark.operators.similarity import (
    _DIM,
    _N_QUERIES,
    _NPROBE,
    _PQ_CODES,
    _PQ_DSUB,
    _PQ_M,
    _PQ_SHORTLIST,
    _K as _TOPK,
    _pq_subd2,
    _quantized,
    _topk_per_query,
)


def _two_stage(spark, sf_dir, synth, decoder, schema, repart=False):
    docs = load(spark, sf_dir, "documents")
    if repart:
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    payloads = docs.select("doc_id", synth()(F.col("doc_id")).alias("payload"))
    return payloads.mapInPandas(decoder(), schema=schema)


def old_mm_audio(spark, sf_dir):
    return _two_stage(
        spark, sf_dir, mm._make_pcm_synth, mm._make_pcm_decoder,
        mm._AUDIO_SCHEMA, repart=True,
    )


def old_mm_video(spark, sf_dir):
    return _two_stage(
        spark, sf_dir, mm._make_video_synth, mm._make_video_decoder,
        mm._VID_SCHEMA, repart=True,
    )


def old_mm_real_decode(spark, sf_dir):
    return _two_stage(
        spark, sf_dir, mm._make_bmp_synth, mm._make_bmp_decoder,
        mm._BMP_STATS_SCHEMA,
    )


def old_mm_decode_resize(spark, sf_dir):
    decoded = _two_stage(
        spark, sf_dir, mm._make_bmp_synth_vardim, mm._make_bmp_resize_decoder,
        mm._RESIZE_SCHEMA,
    )
    size_class = (
        F.when(F.col("width") <= 24, "small")
        .when(F.col("width") <= 40, "medium")
        .otherwise("large")
    )
    return (
        decoded.withColumn("size_class", size_class)
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.col("width") * F.col("height")).alias("total_px"),
            F.sum(F.col("thumb_w") * F.col("thumb_h")).alias("total_thumb_px"),
            F.sum("lum_sum").alias("sum_lum"),
            F.min("tmin").alias("min_block_sum"),
            F.max("tmax").alias("max_block_sum"),
        )
        .orderBy("size_class")
    )


def old_phash_hashes(spark, sf_dir):
    return _two_stage(
        spark, sf_dir, mm._make_phash_bmp_synth, mm._make_phash_decoder,
        mm._PH_SCHEMA, repart=True,
    )


def new_phash_hashes(spark, sf_dir):
    return mm.phash_hashes(spark, sf_dir)


# --- pre-change kmeans_fit_assign (verbatim from HEAD@a332209) ---------------

def old_kmeans_fit_assign(spark, sf_dir, k=_K, iters=_ITERS, vecs=None):
    if vecs is None:
        vecs = load(spark, sf_dir, "embeddings").select(
            "vec_id", quantize(F.col("embedding")).alias("qv")
        )
    seed_rows = (
        vecs.select(
            "vec_id", "qv", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [r["qv"] for r in sorted(seed_rows, key=lambda r: r["vec_id"])]
    vecs = vecs.localCheckpoint()
    assigned = None
    for _ in range(iters):
        prev = assigned
        assigned = vecs.withColumn(
            "cluster", _assign_udf(centroids)(F.col("qv"))
        ).persist()
        assigned.count()
        if prev is not None:
            prev.unpersist()
        pos = assigned.select("cluster", F.posexplode("qv").alias("d", "v"))
        sums = (
            pos.groupBy("cluster", "d")
            .agg(F.sum("v").alias("sv"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("d", "sv"))).alias("ds"))
            .select("cluster", F.transform("ds", lambda s: s["sv"]).alias("sums"))
        )
        counts = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
        stats = {
            r["cluster"]: (r["sums"], r["n"])
            for r in sums.join(counts, "cluster").collect()
        }
        new_centroids = []
        for c in range(len(centroids)):
            if c in stats:
                s, n = stats[c]
                new_centroids.append([x // n for x in s])
            else:
                new_centroids.append(centroids[c])
        centroids = new_centroids
    return assigned.select("vec_id", "cluster")


def new_kmeans_fit_assign(spark, sf_dir):
    from olap_db_spark.operators.kmeans import kmeans_fit_assign

    return kmeans_fit_assign(spark, sf_dir)


# --- pre-change _ivf_topk (old kmeans + posexplode centroids) -----------------

def old_sim_ivf_search(spark, sf_dir):
    q0 = _quantized(load(spark, sf_dir, "embeddings"))
    query_pred = F.col("vec_id") < _N_QUERIES
    assigned = old_kmeans_fit_assign(spark, sf_dir)
    q = q0.join(assigned, "vec_id")
    pos = q.select("cluster", F.posexplode("qv").alias("d", "v"))
    cent = (
        pos.groupBy("cluster", "d")
        .agg(F.expr("sum(v) DIV count(1)").alias("sv"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("d", "sv"))).alias("ds"))
        .select("cluster", F.transform("ds", lambda s: s["sv"]).alias("cv"))
        .withColumn("cn2", norm2_q(F.col("cv")))
    )
    queries = q.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qv_q"),
        F.col("n2").alias("n2_q"),
    )
    w_route = Window.partitionBy("query_id").orderBy(
        F.col("route_cos").desc(), F.col("cluster")
    )
    routed = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "route_cos",
            cosine_q(dot_q(F.col("qv_q"), F.col("cv")), F.col("n2_q"), F.col("cn2")),
        )
        .withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") <= _NPROBE)
        .select("query_id", "qv_q", "n2_q", F.col("cluster").alias("probe_cluster"))
    )
    cands = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cluster").alias("c_cluster"),
        F.col("qv").alias("qv_c"),
        F.col("n2").alias("n2_c"),
    )
    scored = (
        F.broadcast(routed)
        .join(
            cands,
            (F.col("c_cluster") == F.col("probe_cluster"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn(
            "cos_sim",
            cosine_q(dot_q(F.col("qv_q"), F.col("qv_c")), F.col("n2_q"), F.col("n2_c")),
        )
    )
    return _topk_per_query(scored)


# --- pre-change _pq_topk (double collect + window argmin) ---------------------

def old_sim_pq_search(spark, sf_dir):
    q = _quantized(load(spark, sf_dir, "embeddings")).select("vec_id", "qv")
    query_pred = F.col("vec_id") < _N_QUERIES
    seed_ids = [
        r["vec_id"]
        for r in q.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(_PQ_CODES)
        .collect()
    ]
    cb_rows = [
        (code, r["qv"])
        for code, r in enumerate(
            q.filter(F.col("vec_id").isin(seed_ids)).orderBy("vec_id").collect()
        )
    ]
    cb = spark.createDataFrame(cb_rows, "code LONG, qv ARRAY<LONG>")
    subspaces = F.array(
        *[F.slice("qv", s * _PQ_DSUB + 1, _PQ_DSUB) for s in range(_PQ_M)]
    )
    cb_sub = cb.select("code", F.posexplode(subspaces).alias("s", "cv8"))
    v_sub = q.select("vec_id", F.posexplode(subspaces).alias("s", "v8"))
    w_enc = Window.partitionBy("vec_id", "s").orderBy("sub_d2", "code")
    encoded = (
        v_sub.join(F.broadcast(cb_sub), "s")
        .withColumn("sub_d2", _pq_subd2(F.col("v8"), F.col("cv8")))
        .withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    lut = (
        v_sub.filter(query_pred)
        .join(F.broadcast(cb_sub), "s")
        .select(
            F.col("vec_id").alias("query_id"),
            "s",
            "code",
            _pq_subd2(F.col("v8"), F.col("cv8")).alias("part_d2"),
        )
    )
    scored = (
        encoded.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("part_d2").alias("pq_d2"))
    )
    w_short = Window.partitionBy("query_id").orderBy("pq_d2", "neighbor_id")
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= _PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qq = q.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qv_q")
    )
    nn = q.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qv_n"))
    rerank = nn.join(
        F.broadcast(shortlist.join(F.broadcast(qq), "query_id")), "neighbor_id"
    ).withColumn("l2_d2", _pq_subd2(F.col("qv_q"), F.col("qv_n")))
    w_top = Window.partitionBy("query_id").orderBy("l2_d2", "neighbor_id")
    return (
        rerank.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "neighbor_id", "l2_d2")
    )


# --- pre-change sim_ivf_centroids (posexplode + members join) ----------------

def old_sim_ivf_centroids(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.select("label", quantize(F.col("embedding")).alias("qv"))
    pos = q.select("label", F.posexplode("qv").alias("d", "v"))
    agg = (
        pos.groupBy("label", "d")
        .agg(F.sum("v").alias("sv"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.max(F.when(F.col("d") == 0, F.col("sv"))).alias("sv1"),
            F.max(F.when(F.col("d") == 1, F.col("sv"))).alias("sv2"),
        )
    )
    members = q.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        members.join(agg, "label")
        .select(
            "label",
            "n_members",
            (
                F.col("sv1").cast("double") / F.col("n_members") / F.lit(1000000)
            ).alias("centroid_d1"),
            (
                F.col("sv2").cast("double") / F.col("n_members") / F.lit(1000000)
            ).alias("centroid_d2"),
        )
        .orderBy("label")
    )


VARIANTS = {
    "old:mm_audio_rms_windows": old_mm_audio,
    "old:mm_video_frame_sample": old_mm_video,
    "old:mm_real_decode_stats": old_mm_real_decode,
    "old:mm_decode_resize_stats": old_mm_decode_resize,
    "old:phash_hashes": old_phash_hashes,
    "new:phash_hashes": new_phash_hashes,
    "old:kmeans_fit_assign": old_kmeans_fit_assign,
    "new:kmeans_fit_assign": new_kmeans_fit_assign,
    "old:sim_ivf_search": old_sim_ivf_search,
    "old:sim_pq_search": old_sim_pq_search,
    "old:sim_ivf_centroids": old_sim_ivf_centroids,
}


# --- batch 2: pre-change star contraction / minhash_groups / pagerank --------

def _old_star_contraction(pairs):
    edges = (
        pairs.select(
            F.least("doc_a", "doc_b").alias("u"),
            F.greatest("doc_a", "doc_b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    converged = False
    for _ in range(10):
        sym = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("minv"), F.col("u")).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
        )
        d = ls.select(F.col("v").alias("big"), F.col("u").alias("small"))
        sml = d.groupBy("big").agg(F.min("small").alias("m"))
        e_leaves = (
            d.join(sml, "big")
            .where(F.col("small") != F.col("m"))
            .select(F.col("m").alias("u"), F.col("small").alias("v"))
        )
        e_centers = sml.select(F.col("m").alias("u"), F.col("big").alias("v"))
        new_edges = e_leaves.unionAll(e_centers).distinct().localCheckpoint()
        sig = tuple(
            new_edges.agg(
                F.count(F.lit(1)), F.expr("bit_xor(xxhash64(u, v))")
            ).collect()[0]
        )
        edges = new_edges
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError("no convergence")
    members = edges.select(
        F.col("v").alias("doc_id"), F.col("u").alias("component")
    )
    centers = (
        edges.select("u").distinct().select(
            F.col("u").alias("doc_id"), F.col("u").alias("component")
        )
    )
    return members.unionAll(centers)


def old_dedup_components(spark, sf_dir):
    import olap_db_spark.operators.fuzzy_dedup as fd

    pairs = fd.dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    cc = _old_star_contraction(pairs)
    return cc.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).cast("int").alias("is_keeper"),
    )


def old_dedup_cluster_best(spark, sf_dir):
    import olap_db_spark.operators.fuzzy_dedup as fd

    comp = old_dedup_components(spark, sf_dir).select("doc_id", "component")
    toks = fd._dup_corpus(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    scored = comp.join(toks, "doc_id")
    best = scored.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(
            F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("w"),
        F.sum("n_tokens").alias("tot"),
    )
    return best.select(
        "component",
        (-F.col("w.neg_id")).alias("keep_id"),
        "n_members",
        F.col("w.n_tokens").alias("best_tokens"),
        (F.col("tot") - F.col("w.n_tokens")).alias("dropped_tokens"),
    )


def old_dedup_minhash_groups(spark, sf_dir):
    import olap_db_spark.operators.fuzzy_dedup as fd

    corpus = fd._dup_corpus(spark, sf_dir)
    keyed = corpus.select("doc_id", F.md5(F.col("text")).alias("tkey"))
    classes = keyed.groupBy("tkey").agg(
        F.min("doc_id").alias("node"), F.count(F.lit(1)).alias("csize")
    )
    reps = corpus.join(
        classes.select(F.col("node").alias("doc_id")), "doc_id", "left_semi"
    ).repartition("doc_id")
    sh = fd._shingled(reps)
    pairs = (
        fd._candidate_jaccard(fd._lsh_candidates(sh), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    cc = _old_star_contraction(pairs).select(
        F.col("doc_id").alias("node"), "component"
    )
    selfc = (
        classes.filter(F.col("csize") >= 2)
        .join(sh.select(F.col("doc_id").alias("node")), "node", "left_semi")
        .join(cc, "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    node_comp = cc.unionByName(selfc)
    members = (
        keyed.join(classes.select("tkey", "node"), "tkey")
        .join(node_comp, "node")
        .select("doc_id", "component")
    )
    sizes = members.groupBy("component").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return (
        members.join(sizes, "component")
        .select(
            "doc_id",
            F.col("component").alias("group_id"),
            "group_size",
            (F.col("doc_id") == F.col("component")).cast("int").alias("is_keeper"),
        )
    )


def old_graph_pagerank(spark, sf_dir):
    from olap_db_spark.catalog import load as _load
    import olap_db_spark.operators.graph as g

    o = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
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
        o.select("o_custkey").distinct().count()
        + li.select("l_suppkey").distinct().count()
    )
    assert n_nodes <= g._PR_BROADCAST_MAX_NODES
    edges = edges0.join(deg, "src").localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    rank = nodes.select("node", F.lit(g._PR_SCALE).cast("long").alias("rank"))
    for _ in range(g._PR_ITERS):
        contrib = (
            edges.join(
                F.broadcast(rank.withColumnRenamed("node", "src")), "src"
            )
            .select("dst", F.expr("rank DIV deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        rank = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((15 * g._PR_SCALE) // 100)
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
        .limit(g._PR_TOPK)
    )


VARIANTS.update(
    {
        "old:dedup_components": old_dedup_components,
        "old:dedup_cluster_best": old_dedup_cluster_best,
        "old:dedup_minhash_groups": old_dedup_minhash_groups,
        "old:graph_pagerank_purchases": old_graph_pagerank,
    }
)
