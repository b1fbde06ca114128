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
