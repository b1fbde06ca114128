"""Similarity search over the `embeddings` table (BASELINE.json
north_star: "similarity search").

- ``sim_knn_bruteforce`` — exact top-k cosine for a query set: broadcast
  the (tiny) query side against the full vector table. Cost is
  O(|queries| · N) with NO shuffle of the big side — the correct exact
  baseline at any scale. Fully oracle-checked via fixed-point cosine.
- ``sim_ann_lsh`` — random-hyperplane LSH ANN: deterministic md5-derived
  ±1 hyperplanes → 12-bit sign bucket → candidates = bucket collisions →
  exact cosine re-rank. Rows-only (bucketing is engine-internal);
  tests/test_northstar.py asserts recall ≥ 0.6 vs the brute-force top-k.

At 100 TB: brute-force handles ad-hoc query sets (broadcast, one pass);
the LSH path is the standing index — bucket assignment is a map-only
transform, candidate retrieval an equi-join on bucket id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register
from ._materialize import materialize
from ._vector import cosine_q, dot_q, norm2_q, quantize, sql_cosine, sql_dot, sql_quantize
from .kmeans import _ITERS as _KM_ITERS
from .kmeans import kmeans_fit_assign, sql_kmeans_assign

_K = 5
_N_QUERIES = 5  # vec_id < 5 are the query vectors

# --- truth-set sampling ------------------------------------------------------------
# The eval queries' truth routes are brute-force over the full vector
# table per query — the right measurement at probe scales, but the first
# thing a real deployment swaps (the round-8 verdict's ask #5): at
# production scale recall is measured over a SAMPLED query set. The
# sample is HASH-RANK: the _EVAL_SAMPLE_K vectors with the smallest
# md5('annq|' || vec_id) — content-addressed (a pure function of vec_id,
# independent of partitioning; the same construction as the PQ codebook
# seeds and the k-means init), so the sampled eval stays fully
# oracle-checkable. A rank sample pins the query COUNT, not a fraction:
# a fixed-modulus coin made the query set grow with N (measured at the
# sf1 bench: 1250 sampled queries → the truth route went quadratic
# again, 183 s), while K queries hold the truth cost at exactly O(K·N)
# — linear in the corpus at every scale, with recall estimates
# concentrating as 1/sqrt(K) regardless of N. Scale probes pass a
# smaller K to trade eval precision for probe time explicitly.
_EVAL_COIN_PREFIX = "annq"
_EVAL_SAMPLE_K = 100


def _sampled_ids(q: DataFrame, k: int = _EVAL_SAMPLE_K) -> list[int]:
    """The k hash-smallest vec_ids — one distributed top-k
    (TakeOrderedAndProject); only k ids reach the driver."""
    rows = (
        q.select(
            "vec_id",
            F.md5(
                F.concat_ws("|", F.lit(_EVAL_COIN_PREFIX), F.col("vec_id").cast("string"))
            ).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    return [r["vec_id"] for r in rows]


def _sql_sampled_in(col: str, src: str, k: int = _EVAL_SAMPLE_K) -> str:
    """SQL twin: membership in the k hash-smallest vec_ids of CTE ``src``."""
    return (
        f"{col} IN (SELECT vec_id FROM {src} ORDER BY "
        f"md5('{_EVAL_COIN_PREFIX}|' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})"
    )

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id, {sql_quantize('embedding')} AS qv FROM embeddings
),
n AS (SELECT vec_id, qv, {sql_dot('qv', 'qv')} AS n2 FROM q),
scored AS (
  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sql_cosine(sql_dot('qs.qv', 'c.qv'), 'qs.n2', 'c.n2')} AS cos_sim
  FROM n qs JOIN n c ON c.vec_id <> qs.vec_id
  WHERE qs.vec_id < {_N_QUERIES}
)
SELECT query_id, neighbor_id, cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= {_K}
"""


def _quantized(e: DataFrame) -> DataFrame:
    """Shared upstream frame for every vector route: fixed-point
    quantized embedding + its exact integer norm."""
    return e.select("vec_id", quantize(F.col("embedding")).alias("qv")).withColumn(
        "n2", norm2_q(F.col("qv"))
    )


def _topk_per_query(scored: DataFrame) -> DataFrame:
    """Exact top-_K per query over an already-scored candidate stream
    (ties break on neighbor_id → total order)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def _knn_topk(q: DataFrame, query_pred=None) -> DataFrame:
    """Exact brute-force route over a ``_quantized`` frame — extracted so
    composing queries (``sim_ivf_eval``) share the upstream frame instead
    of rebuilding the corpus subtree (round-7 lesson). ``query_pred``
    overrides the default fixed query set (truth-set sampling)."""
    if query_pred is None:
        query_pred = F.col("vec_id") < _N_QUERIES
    queries = q.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qv_q"),
        F.col("n2").alias("n2_q"),
    )
    cands = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qv").alias("qv_c"),
        F.col("n2").alias("n2_c"),
    )
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            cosine_q(
                dot_q(F.col("qv_q"), F.col("qv_c")), F.col("n2_q"), F.col("n2_c")
            ),
        )
    )
    return _topk_per_query(scored)


@register("sim_knn_bruteforce", oracle=_KNN_ORACLE, tags=("similarity", "northstar"))
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors (vec_id < 5).

    The query side is broadcast — the big vector table is scanned once,
    never shuffled; top-k per query via window on the (small) scored set.
    Ties break on neighbor_id so the result is total-ordered."""
    return _knn_topk(_quantized(load(spark, sf_dir, "embeddings")))


# --- LSH ANN ---------------------------------------------------------------------

# 12 tables × 4 bits: tuned for the weak-similarity regime of the test
# vectors (true top-5 cosines ≈ 0.3–0.4 ⇒ per-bit collision p ≈ 0.61,
# table hit ≈ 0.14, 12-table recall ≈ 0.83). At real scale raise bits per
# table with log2(N) to keep bucket occupancy bounded.
_N_TABLES = 12
_BITS_PER_TABLE = 4
_DIM = 64


def _hyperplanes() -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5(plane|dim) — reproducible
    across runs/engines without any RNG."""
    planes = []
    for p in range(_N_TABLES * _BITS_PER_TABLE):
        row = []
        for d in range(_DIM):
            h = hashlib.md5(f"{p}|{d}".encode()).digest()[0]
            row.append(1 if h % 2 == 0 else -1)
        planes.append(row)
    return planes


def _lsh_oracle() -> str:
    """DuckDB mirror of the full LSH pipeline: the md5-derived ±1 planes
    embed as a VALUES literal, sign bits / bucket packing replicate the
    vectorized bucketer exactly (dots > 0, bucket = Σ bit<<b), then the
    same candidate equi-join + exact cosine re-rank — so even the ANN
    index is hash-checked, not just recall-tested."""
    planes = _hyperplanes()
    rows = ", ".join(
        f"({p}, {planes[p]})".replace(" ", "") for p in range(len(planes))
    )
    return f"""
WITH q AS (
  SELECT vec_id, {sql_quantize('embedding')} AS qv FROM embeddings
),
n AS (SELECT vec_id, qv, {sql_dot('qv', 'qv')} AS n2 FROM q),
pl(p, pv) AS (VALUES {rows}),
sig AS (
  SELECT n.vec_id, pl.p,
         CASE WHEN {sql_dot('n.qv', 'pl.pv')} > 0 THEN 1 ELSE 0 END AS bit
  FROM n CROSS JOIN pl
),
buck AS (
  SELECT vec_id, p // {_BITS_PER_TABLE} AS table_no,
         CAST(SUM(bit * (1 << (p % {_BITS_PER_TABLE}))) AS BIGINT) AS bucket
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM buck qb
  JOIN buck cb ON cb.table_no = qb.table_no AND cb.bucket = qb.bucket
  WHERE qb.vec_id < {_N_QUERIES} AND cb.vec_id <> qb.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         {sql_cosine(sql_dot('qs.qv', 'nb.qv'), 'qs.n2', 'nb.n2')} AS cos_sim
  FROM cand c
  JOIN n qs ON qs.vec_id = c.query_id
  JOIN n nb ON nb.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= {_K}
"""


@register("sim_ann_lsh", oracle=_lsh_oracle(), tags=("similarity", "northstar"))
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via multi-table random-hyperplane LSH (_N_TABLES tables
    of _BITS_PER_TABLE-bit sign buckets) + exact cosine re-rank over the
    union of bucket collisions.

    Oracle-checked since round 2: the deterministic md5-derived planes
    and exact-int sign buckets mirror into SQL (see ``_lsh_oracle``), so
    the whole index pipeline hash-compares; recall vs brute force is
    additionally asserted in tests. Scale shape: signatures are a
    map-only pass; candidate fetch is an equi-join on (table, bucket) —
    no pairwise blow-up. Tune _BITS_PER_TABLE with N (more bits →
    smaller buckets)."""
    e = load(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    q = e.select("vec_id", quantize(F.col("embedding")).alias("qv")).withColumn(
        "n2", norm2_q(F.col("qv"))
    )

    # All table signatures in ONE vectorized integer matmul (Arrow batch →
    # numpy int64 (n,64) @ (64,planes)): exact integer arithmetic, so the
    # buckets are deterministic, and ~50× less work than per-plane
    # interpreted array lambdas. Self-contained closure (executor workers
    # cannot import this package).
    n_tables, bits = _N_TABLES, _BITS_PER_TABLE
    plane_rows = [list(row) for row in planes]

    def _make_bucketer():
        from pyspark.sql.functions import pandas_udf as _pudf

        def buckets(qvs):
            import numpy as _np
            import pandas as _pd

            pm = _np.array(plane_rows, dtype=_np.int64).T  # (dim, planes)
            mat = _np.stack(qvs.map(_np.asarray).values).astype(_np.int64)
            dots = mat @ pm  # (n, planes), exact int64
            bit = (dots > 0).astype(_np.int64)
            out = []
            for t in range(n_tables):
                chunk = bit[:, t * bits : (t + 1) * bits]
                out.append(chunk @ (1 << _np.arange(bits, dtype=_np.int64)))
            stacked = _np.stack(out, axis=1)  # (n, tables)
            return _pd.Series(list(stacked))

        return _pudf(buckets, "array<long>")

    bucketed = q.select(
        "vec_id",
        "qv",
        "n2",
        F.posexplode(_make_bucketer()(F.col("qv"))).alias("table_no", "bucket"),
    )
    queries = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qv_q"),
        F.col("n2").alias("n2_q"),
        F.col("table_no").alias("tq"),
        F.col("bucket").alias("bq"),
    )
    cands = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qv").alias("qv_c"),
        F.col("n2").alias("n2_c"),
        F.col("table_no").alias("tc"),
        F.col("bucket").alias("bc"),
    )
    pairs = (
        F.broadcast(queries)
        .join(
            cands,
            (F.col("tq") == F.col("tc"))
            & (F.col("bq") == F.col("bc"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "qv_q", "n2_q", "qv_c", "n2_c")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.withColumn(
        "cos_sim",
        cosine_q(dot_q(F.col("qv_q"), F.col("qv_c")), F.col("n2_q"), F.col("n2_c")),
    )
    return _topk_per_query(scored)


# --- centroid/IVF-style coarse quantizer ---------------------------------------------

_IVF_ORACLE = f"""
WITH q AS (
  SELECT vec_id, label, {sql_quantize('embedding')} AS qv FROM embeddings
),
pos AS (
  SELECT label, unnest(qv) AS v, unnest(range(0, {_DIM})) AS d FROM q
),
sums AS (SELECT label, d, SUM(v) AS sv FROM pos GROUP BY label, d),
agg AS (
  SELECT label,
         MAX(CASE WHEN d = 0 THEN sv END) AS sv1,
         MAX(CASE WHEN d = 1 THEN sv END) AS sv2
  FROM sums GROUP BY label
),
members AS (SELECT label, COUNT(*) AS n_members FROM q GROUP BY label)
SELECT m.label, m.n_members,
       CAST(a.sv1 AS DOUBLE) / m.n_members / 1000000 AS centroid_d1,
       CAST(a.sv2 AS DOUBLE) / m.n_members / 1000000 AS centroid_d2
FROM members m JOIN agg a ON a.label = m.label
ORDER BY m.label
"""


@register("sim_ivf_centroids", oracle=_IVF_ORACLE, tags=("similarity", "northstar"))
def sim_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer building block: per-partition (label) centroid
    of quantized vectors — element-wise exact integer sums, so even the
    centroid computation hash-compares. At scale, labels come from k-means
    iterations built on exactly this aggregate."""
    e = load(spark, sf_dir, "embeddings")
    q = e.select("label", quantize(F.col("embedding")).alias("qv"))
    # ONE map-side-combinable hash aggregate: the output only needs the
    # d=0/d=1 component sums and the member count, so sum(qv[0])/sum(qv[1])
    # as columns replace the former posexplode → groupBy(label, d) →
    # groupBy(label) → join(members) chain (a 64× row fan-out, 3 exchanges
    # and a join for two sums a single aggregate computes directly —
    # guide §2.3 "aggregate before you shuffle").
    return (
        q.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("qv").getItem(0)).alias("sv1"),
            F.sum(F.col("qv").getItem(1)).alias("sv2"),
        )
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


_NPROBE = 4

# K-means-routed IVF, still fully hash-checked: sql_kmeans_assign() unrolls
# the deterministic integer Lloyd iterations into CTEs, so the oracle
# reproduces the EXACT cluster assignment, then performs the same
# route-to-nprobe-centroids + exact-top-k-within-probes search.
_IVF_SEARCH_ORACLE = f"""
WITH {sql_kmeans_assign()},
n AS (SELECT vec_id, cluster, qv, {sql_dot('qv', 'qv')} AS n2 FROM assign{_KM_ITERS}),
pos AS (SELECT cluster, unnest(qv) AS v, unnest(range(0, {_DIM})) AS d
        FROM assign{_KM_ITERS}),
cent AS (
  -- integer MEAN centroid: truncating division (DuckDB // == Spark DIV,
  -- both toward zero) bounds each component by the quantization scale,
  -- so cn2 <= dim * scale^2 can never overflow BIGINT no matter how
  -- large a cluster grows (sum-vector centroids overflowed at the sf10
  -- probe); cosine routing against the mean is the true IVF route
  SELECT cluster, list(sv ORDER BY d) AS cv, {sql_dot('list(sv ORDER BY d)', 'list(sv ORDER BY d)')} AS cn2
  FROM (SELECT cluster, d, CAST(SUM(v) AS BIGINT) // COUNT(*) AS sv FROM pos GROUP BY cluster, d) t
  GROUP BY cluster
),
routed AS (
  SELECT vec_id, cluster AS probe_cluster FROM (
    SELECT qs.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY qs.vec_id
             ORDER BY {sql_cosine(sql_dot('qs.qv', 'c.cv'), 'qs.n2', 'c.cn2')} DESC,
                      c.cluster) AS rn
    FROM n qs CROSS JOIN cent c
    WHERE qs.vec_id < {_N_QUERIES}
  ) WHERE rn <= {_NPROBE}
),
scored AS (
  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sql_cosine(sql_dot('qs.qv', 'c.qv'), 'qs.n2', 'c.n2')} AS cos_sim
  FROM routed r
  JOIN n qs ON qs.vec_id = r.vec_id
  JOIN n c  ON c.cluster = r.probe_cluster AND c.vec_id <> qs.vec_id
)
SELECT query_id, neighbor_id, cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= {_K}
"""


@register("sim_ivf_search", oracle=_IVF_SEARCH_ORACLE, tags=("similarity", "northstar"))
def sim_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search over K-MEANS partitions: route each query to its
    nprobe=4 nearest cluster centroids, then exact top-5 cosine within
    those clusters only.

    Fully oracle-checked — twice over: the deterministic integer Lloyd
    loop unrolls into SQL (``sql_kmeans_assign``) so DuckDB reproduces
    the exact cluster assignment, and the routing centroid is the exact
    integer MEAN of its members (truncating DIV, identical in both
    engines — components stay bounded by the quantization scale so the
    centroid norm can never overflow int64 at any cluster size; the
    sum-vector form did at the sf10 probe). Round-1 used the testdata's
    arbitrary ``label``
    partitions (recall ~0.2–0.3, honestly documented); geometric k-means
    cells fix recall (asserted ≥ 0.6 in tests/test_northstar.py).

    At 100 TB: the Lloyd loop is a map-only Arrow assignment + one
    partial aggregate per iteration (k·dim ints to the driver); the
    search is an equi-join on the routed cluster id — scanned data drops
    by (nprobe / k)."""
    return _ivf_topk(spark, sf_dir)


def _ivf_fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted corpus frame every IVF consumer shares: the k-means
    assignment WITH its quantized vectors (one persisted frame from
    ``kmeans_fit_assign(full=True)`` — the IVF posting list) plus the
    exact integer norm. r13: the former shape re-derived
    quantize-from-parquet per consumer and paid a vecs-to-assignment
    equi-join; this is a map-only projection of the already-persisted
    assignment (guide 2.4)."""
    return kmeans_fit_assign(spark, sf_dir, full=True).withColumn(
        "n2", norm2_q(F.col("qv"))
    )


def _ivf_topk(
    spark: SparkSession, sf_dir: str, qn: DataFrame | None = None, query_pred=None
) -> DataFrame:
    """IVF route over the shared fitted frame (``_ivf_fitted``):
    integer-MEAN centroids, nprobe routing, exact re-rank within probed
    cells. Extracted (like ``_knn_topk``) so ``sim_ivf_eval`` composes
    both routes off one upstream frame. ``query_pred`` overrides the
    default fixed query set (truth-set sampling)."""
    if query_pred is None:
        query_pred = F.col("vec_id") < _N_QUERIES
    q = qn if qn is not None else _ivf_fitted(spark, sf_dir)
    # exact integer MEAN centroid per k-means cluster (truncating DIV —
    # components bounded by the quantization scale, so the centroid norm
    # can never overflow int64 at any cluster size; mirrors the oracle's
    # // division exactly).
    # r12 note: a single wide aggregate (64 per-dimension sum columns, no
    # posexplode) was tried and measured ~0.2 s SLOWER per run at sf0.1
    # (0.45 vs 0.25 s isolated): the 64 sum+DIV buffers blow up the
    # generated aggregate code and the compile cost recurs per run, while
    # this explode shape's exchanges carry only k×dim pre-combined rows
    # (map-side partial aggregation), so it is not a scale hazard either.
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


# --- measured IVF recall (the dedup_lsh_eval pattern on the vector side) ----------

def _ivf_eval_oracle(qpred: str) -> str:
    """IVF-eval oracle with the query-set predicate (over alias ``qs``)
    injected — the default fixed set or the sampled-coin set."""
    return f"""
WITH {sql_kmeans_assign()},
n AS (SELECT vec_id, cluster, qv, {sql_dot('qv', 'qv')} AS n2 FROM assign{_KM_ITERS}),
pos AS (SELECT cluster, unnest(qv) AS v, unnest(range(0, {_DIM})) AS d
        FROM assign{_KM_ITERS}),
cent AS (
  SELECT cluster, list(sv ORDER BY d) AS cv, {sql_dot('list(sv ORDER BY d)', 'list(sv ORDER BY d)')} AS cn2
  FROM (SELECT cluster, d, CAST(SUM(v) AS BIGINT) // COUNT(*) AS sv FROM pos GROUP BY cluster, d) t
  GROUP BY cluster
),
routed AS (
  SELECT vec_id, cluster AS probe_cluster FROM (
    SELECT qs.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY qs.vec_id
             ORDER BY {sql_cosine(sql_dot('qs.qv', 'c.cv'), 'qs.n2', 'c.cn2')} DESC,
                      c.cluster) AS rn
    FROM n qs CROSS JOIN cent c
    WHERE {qpred}
  ) WHERE rn <= {_NPROBE}
),
iscored AS (
  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sql_cosine(sql_dot('qs.qv', 'c.qv'), 'qs.n2', 'c.n2')} AS cos_sim
  FROM routed r
  JOIN n qs ON qs.vec_id = r.vec_id
  JOIN n c  ON c.cluster = r.probe_cluster AND c.vec_id <> qs.vec_id
),
ivf AS (
  SELECT query_id, neighbor_id, 1 AS in_i
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM iscored) t
  WHERE rn <= {_K}
),
tscored AS (
  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sql_cosine(sql_dot('qs.qv', 'c.qv'), 'qs.n2', 'c.n2')} AS cos_sim
  FROM n qs JOIN n c ON c.vec_id <> qs.vec_id
  WHERE {qpred}
),
truth AS (
  SELECT query_id, neighbor_id, 1 AS in_t
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM tscored) t
  WHERE rn <= {_K}
)
SELECT query_id,
       CAST(COUNT(in_t) AS BIGINT) AS n_truth,
       CAST(COUNT(in_i) AS BIGINT) AS n_ivf,
       CAST(COUNT(CASE WHEN in_t IS NOT NULL AND in_i IS NOT NULL THEN 1 END) AS BIGINT) AS n_hit,
       CAST(COUNT(CASE WHEN in_t IS NOT NULL AND in_i IS NULL THEN 1 END) AS BIGINT) AS missed,
       CAST(CASE WHEN COUNT(in_t) = 0 THEN 0
            ELSE (COUNT(CASE WHEN in_t IS NOT NULL AND in_i IS NOT NULL THEN 1 END) * 1000000)
                 // COUNT(in_t) END AS BIGINT) AS recall_micro
FROM truth FULL JOIN ivf USING (query_id, neighbor_id)
GROUP BY query_id
"""


_IVF_EVAL_ORACLE = _ivf_eval_oracle(f"qs.vec_id < {_N_QUERIES}")


def _ivf_eval_df(
    spark: SparkSession, sf_dir: str, query_pred=None, query_k: int | None = None
) -> DataFrame:
    """Measured ANN quality — the ``dedup_lsh_eval`` pattern applied to
    the vector side: per-query recall@k=5 of the IVF route
    (``_ivf_topk``: k-means cells, integer-MEAN centroids, nprobe=4)
    against the exact brute-force truth (``_knn_topk``), as integer
    micros via truncating DIV (Spark ``DIV`` ≡ DuckDB ``//`` on
    non-negatives) — so the quality/speed trade of the ANN index is a
    measured artifact, not a docstring claim.

    One row per query: n_truth / n_ivf (both = _K by construction,
    asserted as identities in tests), n_hit (IVF results that are true
    top-k neighbors), missed (= n_truth − n_hit), recall_micro.

    Scale shape: both routes share ONE ``_quantized`` upstream frame
    (never rebuilt per route — the round-7 composition lesson); the
    comparison is a single full-outer equi-join on the (query, neighbor)
    pair key with every count folded from that one joined stream in one
    map-side-combinable aggregate — no scalar-count branches re-deriving
    the search pipelines. The truth route is O(|queries|·N) with the
    vector table scanned once and never shuffled — the measurement
    price, exactly as in ``dedup_lsh_eval``, is the point of the query."""
    # ONE upstream frame for BOTH routes: the persisted fitted corpus
    # (r13 — the truth route used to re-derive quantize from parquet while
    # the IVF route paid a join onto the assignment; the fitted frame has
    # identical (vec_id, qv, n2) rows, plus the cluster the IVF route
    # needs, and is already materialized by the fit).
    qn = _ivf_fitted(spark, sf_dir)
    if query_k is not None:
        query_pred = F.col("vec_id").isin(_sampled_ids(qn, query_k))
    truth = _knn_topk(qn, query_pred).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_t")
    )
    ivf = _ivf_topk(spark, sf_dir, qn, query_pred).select(
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


@register("sim_ivf_eval", oracle=_IVF_EVAL_ORACLE, tags=("similarity", "eval"))
def sim_ivf_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_eval_df(spark, sf_dir)


sim_ivf_eval.__doc__ = _ivf_eval_df.__doc__


@register(
    "sim_ivf_eval_sampled",
    oracle=_ivf_eval_oracle(_sql_sampled_in("qs.vec_id", "n")),
    tags=("similarity", "eval", "sample"),
)
def sim_ivf_eval_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sim_ivf_eval`` over a SAMPLED query set — the production form of
    the recall measurement (r8 verdict ask #5): queries are the
    ``_EVAL_SAMPLE_K`` vectors with the hash-smallest content-addressed
    md5 rank, so the brute-force truth route costs exactly O(K·N) — the
    query COUNT, and with it the measurement price per corpus row, is
    pinned at every scale (a fixed-fraction coin grew the query set with
    N and went quadratic again at the sf1 bench). The whole eval,
    sampling included, hash-checks against the oracle; scale probes pass
    a smaller K to trade eval precision for probe time explicitly."""
    return _ivf_eval_df(spark, sf_dir, query_k=_EVAL_SAMPLE_K)


# --- incremental IVF index refresh -------------------------------------------------

# Content-addressed corpus split for the refresh scenario: vectors whose
# md5 coin lands 0 are the APPENDED batch, the rest are the indexed base
# (same portable-coin construction as the eval sampling; a pure function
# of vec_id, so the whole maintenance decision hash-checks).
_REFRESH_COIN_PREFIX = "ivfnew"
_REFRESH_COIN_MOD = 4
# re-center a cell iff appended ≥ 20% of its indexed members
_REFRESH_NUM, _REFRESH_DEN = 1, 5

_SQL_REFRESH_COIN = (
    f"CAST('0x' || substr(md5('{_REFRESH_COIN_PREFIX}|' || "
    f"CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % {_REFRESH_COIN_MOD} = 0"
)

_IVF_REFRESH_ORACLE = f"""
WITH basev AS (
  SELECT vec_id, {sql_quantize('embedding')} AS qv
  FROM embeddings WHERE NOT ({_SQL_REFRESH_COIN})
),
{sql_kmeans_assign(vecs_sql="SELECT vec_id, qv FROM basev")},
bpos AS (SELECT cluster, unnest(qv) AS v, unnest(range(0, {_DIM})) AS d
         FROM assign{_KM_ITERS}),
cent AS (
  SELECT cluster, list(sv ORDER BY d) AS cv,
         {sql_dot('list(sv ORDER BY d)', 'list(sv ORDER BY d)')} AS cn2
  FROM (SELECT cluster, d, CAST(SUM(v) AS BIGINT) // COUNT(*) AS sv
        FROM bpos GROUP BY cluster, d) t
  GROUP BY cluster
),
counts AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_base
           FROM assign{_KM_ITERS} GROUP BY cluster),
newv AS (
  SELECT vec_id, {sql_quantize('embedding')} AS qv
  FROM embeddings WHERE ({_SQL_REFRESH_COIN})
),
nassign AS (
  SELECT vec_id, qv, cluster FROM (
    SELECT v.vec_id, v.qv, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY c.cn2 - 2 * {sql_dot('v.qv', 'c.cv')}, c.cluster) AS rn
    FROM newv v CROSS JOIN cent c) WHERE rn = 1
),
ncounts AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_new
            FROM nassign GROUP BY cluster),
decide AS (
  SELECT c.cluster, c.n_base, COALESCE(n.n_new, 0) AS n_new,
         CASE WHEN {_REFRESH_DEN} * COALESCE(n.n_new, 0)
                   >= {_REFRESH_NUM} * c.n_base
              THEN 1 ELSE 0 END AS refreshed
  FROM counts c LEFT JOIN ncounts n USING (cluster)
),
rmembers AS (
  SELECT a.cluster, a.qv FROM assign{_KM_ITERS} a
  JOIN decide d ON d.cluster = a.cluster AND d.refreshed = 1
  UNION ALL
  SELECT n.cluster, n.qv FROM nassign n
  JOIN decide d ON d.cluster = n.cluster AND d.refreshed = 1
),
remean AS (
  SELECT cluster, d, CAST(SUM(v) AS BIGINT) // COUNT(*) AS sv
  FROM (SELECT cluster, unnest(qv) AS v, unnest(range(0, {_DIM})) AS d
        FROM rmembers) p
  GROUP BY cluster, d
),
re2 AS (
  SELECT cluster,
         MAX(CASE WHEN d = 0 THEN sv END) AS r0,
         MAX(CASE WHEN d = 1 THEN sv END) AS r1
  FROM remean GROUP BY cluster
)
SELECT d.cluster, d.n_base, d.n_new, CAST(d.refreshed AS BIGINT) AS refreshed,
       CAST(CASE WHEN d.refreshed = 1 THEN re2.r0 ELSE cent.cv[1] END
            AS BIGINT) AS centroid_d0,
       CAST(CASE WHEN d.refreshed = 1 THEN re2.r1 ELSE cent.cv[2] END
            AS BIGINT) AS centroid_d1
FROM decide d
JOIN cent ON cent.cluster = d.cluster
LEFT JOIN re2 ON re2.cluster = d.cluster
ORDER BY d.cluster
"""


@register(
    "sim_ivf_refresh",
    oracle=_IVF_REFRESH_ORACLE,
    tags=("similarity", "maintenance"),
)
def sim_ivf_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index refresh (r9 verdict stretch item a) — the
    "index refreshed on a slower cadence than the append" that
    ``streaming/retrieval.py``'s docstring promises, made real: given an
    indexed BASE corpus and an APPENDED batch (content-addressed md5
    split of the embeddings table), route each appended vector to its
    nearest EXISTING centroid (the cheap map-side step — broadcast
    k·dim ints, no Lloyd iterations), then re-center ONLY the cells
    whose appended count crossed the threshold (appended ≥ 20% of the
    cell's indexed members). One row per cell: base/new member counts,
    the refresh decision, and the first two post-maintenance centroid
    components (exact integer means — truncating DIV, identical in both
    engines), so the whole maintenance pass hash-checks.

    Scale shape: the appended batch never triggers a k-means fit — its
    assignment is one broadcast-centroid argmin over O(new rows); the
    re-center aggregate runs over REFRESHED cells only (a broadcast
    semi-join on the O(k) decision frame gates the posexplode), so a
    quiet index costs O(new rows) per maintenance pass, not O(corpus).
    """
    e = load(spark, sf_dir, "embeddings")
    from .data_selection import _md5_coin

    is_new = _md5_coin(_REFRESH_COIN_PREFIX, F.col("vec_id"), _REFRESH_COIN_MOD) == 0
    allq = e.select("vec_id", quantize(F.col("embedding")).alias("qv"), is_new.alias("is_new"))
    base = allq.filter(~F.col("is_new")).select("vec_id", "qv")
    newv = allq.filter(F.col("is_new")).select("vec_id", "qv")
    assigned, cent, counts = ivf_base_index(spark, sf_dir, base)
    nassign = ivf_route(newv, cent)
    return ivf_refresh_report(assigned, cent, counts, nassign)


def ivf_base_index(
    spark: SparkSession, sf_dir: str, base: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The standing IVF index over a ``(vec_id, qv)`` base corpus:
    (assigned members, centroid table with ``cn2`` norms, per-cell
    counts). Extracted so the streaming twin
    (``streaming/ann_maintenance.py``) pins the SAME index the batch
    operator builds."""
    # r13: full=True returns (vec_id, qv, cluster) straight off the
    # persisted assignment — the former .join(base, "vec_id") re-derived
    # the base subtree and paid an equi-join for a column the fit already
    # carried.
    assigned = kmeans_fit_assign(spark, sf_dir, vecs=base, full=True)
    # exact integer-MEAN centroid per cell (truncating DIV — the _ivf_topk
    # convention, mirrored by the oracle's // division). r12 note: the
    # wide single-aggregate variant (64 sum columns) measured slower —
    # see the rationale in _ivf_topk; the explode shape's exchanges carry
    # only k×dim pre-combined rows.
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
    return assigned, cent, counts


def ivf_route(newv: DataFrame, cent: DataFrame) -> DataFrame:
    """Appended vectors → nearest EXISTING centroid (no Lloyd re-fit):
    the same exact integer metric as the Lloyd assignment
    (|c|² − 2·v·c, ties to the lowest cluster id), broadcast k rows
    against O(new) rows — the cheap map-side step both the batch
    operator and the streaming twin run per arriving batch.

    r13: the argmin is ONE lexicographic struct-min hash aggregate —
    (dist, cluster) is unique per vec_id, so min(struct(dist, cluster,
    qv)) IS the row_number()==1 row (qv rides along: it is constant per
    vec_id, and (dist, cluster) already totally orders the group). The
    former window shape paid a full exchange+sort of the O(new)×k
    candidate stream where a map-side-combinable aggregate suffices —
    the same lesson as _pq_topk's encode argmin (r12)."""
    return (
        newv.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.struct(
                (F.col("cn2") - 2 * dot_q(F.col("qv"), F.col("cv"))).alias("d"),
                F.col("cluster"),
                F.col("qv"),
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.min("cand").alias("m"))
        .select("vec_id", F.col("m.qv").alias("qv"), F.col("m.cluster").alias("cluster"))
    )


def ivf_refresh_report(
    assigned: DataFrame, cent: DataFrame, counts: DataFrame, nassign: DataFrame
) -> DataFrame:
    """The maintenance decision + selective re-center over an index and a
    routed appended set — the slow-cadence pass, shared by the batch
    operator and the streaming twin's read-side evaluation."""
    ncounts = nassign.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_new"))
    decide = (
        counts.join(ncounts, "cluster", "left")
        .select(
            "cluster",
            F.col("n_base").cast("long").alias("n_base"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
        )
        .withColumn(
            "refreshed",
            F.when(
                F.lit(_REFRESH_DEN) * F.col("n_new")
                >= F.lit(_REFRESH_NUM) * F.col("n_base"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    hot = F.broadcast(decide.filter(F.col("refreshed") == 1).select("cluster"))
    rmembers = (
        assigned.select("cluster", "qv")
        .join(hot, "cluster", "left_semi")
        .unionByName(nassign.select("cluster", "qv").join(hot, "cluster", "left_semi"))
    )
    # only the reported components aggregate here (the full re-centered
    # vector would be the same per-dim mean over all 64 dims)
    re2 = (
        rmembers.select(
            "cluster", F.col("qv")[0].alias("v0"), F.col("qv")[1].alias("v1")
        )
        .groupBy("cluster")
        .agg(
            F.expr("sum(v0) DIV count(1)").alias("r0"),
            F.expr("sum(v1) DIV count(1)").alias("r1"),
        )
    )
    old2 = cent.select(
        "cluster", F.col("cv")[0].alias("o0"), F.col("cv")[1].alias("o1")
    )
    return (
        decide.join(old2, "cluster")
        .join(re2, "cluster", "left")
        .select(
            "cluster",
            "n_base",
            "n_new",
            "refreshed",
            F.when(F.col("refreshed") == 1, F.col("r0"))
            .otherwise(F.col("o0"))
            .cast("long")
            .alias("centroid_d0"),
            F.when(F.col("refreshed") == 1, F.col("r1"))
            .otherwise(F.col("o1"))
            .cast("long")
            .alias("centroid_d1"),
        )
        .orderBy("cluster")
    )


# --- product quantization (PQ) ANN -----------------------------------------------

_PQ_M = 8  # subspaces
_PQ_DSUB = _DIM // _PQ_M  # dims per subspace
_PQ_CODES = 16  # codes per subspace codebook
_PQ_SHORTLIST = 50  # ADC shortlist size fed to the exact re-rank

_PQ_SUBD2 = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2])))"
)

def _pq_ctes(qpred_v: str) -> str:
    """PQ pipeline CTEs with the LUT query-set predicate (over alias
    ``v``) injected — fixed set or sampled coin."""
    return f"""q AS (
  SELECT vec_id, {sql_quantize('embedding')} AS qv FROM embeddings
),
seeds AS (SELECT vec_id FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_PQ_CODES}),
cb AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, qv
  FROM q WHERE vec_id IN (SELECT vec_id FROM seeds)
),
ss AS (SELECT unnest(range(0, {_PQ_M})) AS s),
cb_sub AS (
  SELECT cb.code, ss.s, cb.qv[ss.s * {_PQ_DSUB} + 1 : (ss.s + 1) * {_PQ_DSUB}] AS cv8
  FROM cb CROSS JOIN ss
),
v_sub AS (
  SELECT q.vec_id, ss.s, q.qv[ss.s * {_PQ_DSUB} + 1 : (ss.s + 1) * {_PQ_DSUB}] AS v8
  FROM q CROSS JOIN ss
),
encoded AS (
  SELECT vec_id, s, code FROM (
    SELECT v.vec_id, v.s, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY {_PQ_SUBD2.format(a='v.v8', b='c.cv8')}, c.code) AS rn
    FROM v_sub v JOIN cb_sub c ON c.s = v.s) t
  WHERE rn = 1
),
lut AS (
  SELECT v.vec_id AS query_id, v.s, c.code,
         {_PQ_SUBD2.format(a='v.v8', b='c.cv8')} AS part_d2
  FROM v_sub v JOIN cb_sub c ON c.s = v.s
  WHERE {qpred_v}
),
scored AS (
  SELECT l.query_id, e.vec_id AS neighbor_id, CAST(SUM(l.part_d2) AS BIGINT) AS pq_d2
  FROM encoded e JOIN lut l ON l.s = e.s AND l.code = e.code
  WHERE e.vec_id <> l.query_id
  GROUP BY l.query_id, e.vec_id
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY pq_d2, neighbor_id) AS rn
    FROM scored) t
  WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS (
  SELECT s.query_id, s.neighbor_id,
         CAST({_PQ_SUBD2.format(a='qq.qv', b='nq.qv')} AS BIGINT) AS l2_d2
  FROM shortlist s
  JOIN q qq ON qq.vec_id = s.query_id
  JOIN q nq ON nq.vec_id = s.neighbor_id
)"""


_PQ_CTES = _pq_ctes(f"v.vec_id < {_N_QUERIES}")

_PQ_ORACLE = f"""
WITH {_PQ_CTES}
SELECT query_id, neighbor_id, l2_d2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY l2_d2, neighbor_id) AS rn
      FROM rerank) t
WHERE rn <= {_K}
"""


def _pq_subd2(a, b):
    """Exact int64 squared L2 distance between two subvectors (column expr)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register("sim_pq_search", oracle=_PQ_ORACLE, tags=("similarity", "northstar"))
def sim_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the memory-bound scale path: vectors
    compress to 8 one-byte codes (64 dims -> 8 bytes, 32x smaller) and
    queries scan CODES via an ADC lookup table instead of raw vectors.

    Codebooks are the md5-seeded deterministic sample (same seeding as
    k-means init), one per subspace; encoding is an exact-int64 argmin
    (ties -> lowest code), ADC distances are exact int64 sums — so the
    whole pipeline, codebook build included, hash-checks against the
    DuckDB oracle.

    Scale shape: encode = one scan (explode to 8 subvectors, join a
    128-row broadcast codebook, per-subspace argmin); search = codes
    joined to a broadcast 640-row LUT + partial-agg sum, then an EXACT
    re-rank that touches raw vectors for only the top-_PQ_SHORTLIST ADC
    candidates per query — the standard PQ pipeline: the full-precision
    table is read for ~10%% of rows, the code table for the rest, which
    is the entire point of PQ at 100 TB. Recall vs exact L2 asserted
    >= 0.6 in tests/test_northstar.py."""
    e = load(spark, sf_dir, "embeddings")
    # shared-frame checkpoint (r13): the quantized corpus feeds the seed
    # top-k, the encode explode, the LUT explode and both re-rank sides —
    # five references that each re-ran scan+quantize (the r12 ≥3-consumer
    # rule from the dedup family, applied to the PQ route). One row per
    # vector — the (vec_id, qv) table a PQ service stores anyway.
    q = materialize(e.select("vec_id", quantize(F.col("embedding")).alias("qv")))
    return _pq_topk(spark, q)


def _pq_topk(spark: SparkSession, q: DataFrame, query_pred=None) -> DataFrame:
    """PQ route over a ``(vec_id, qv)`` frame — extracted (like
    ``_knn_topk``/``_ivf_topk``) so ``sim_pq_eval`` composes it against
    the exact-L2 truth off one shared upstream frame. ``query_pred``
    overrides the default fixed query set (truth-set sampling)."""
    if query_pred is None:
        query_pred = F.col("vec_id") < _N_QUERIES
    # codebook: the _PQ_CODES md5-smallest vec_ids. ONE tiny driver
    # collect — the top-k carries qv along (the kmeans seed pattern), so
    # the former second scan (isin(seed_ids) re-filter + collect) is gone.
    # This is index BUILD; the searched data never reaches the driver.
    seed_rows = (
        q.select(
            "vec_id", "qv", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(_PQ_CODES)
        .collect()
    )
    cb_rows = [
        (code, r["qv"])
        for code, r in enumerate(sorted(seed_rows, key=lambda r: r["vec_id"]))
    ]
    cb = spark.createDataFrame(cb_rows, "code LONG, qv ARRAY<LONG>")
    subspaces = F.array(
        *[F.slice("qv", s * _PQ_DSUB + 1, _PQ_DSUB) for s in range(_PQ_M)]
    )
    cb_sub = cb.select("code", F.posexplode(subspaces).alias("s", "cv8"))
    v_sub = q.select("vec_id", F.posexplode(subspaces).alias("s", "v8"))
    # argmin over codes as ONE lexicographic struct-min hash aggregate —
    # (sub_d2, code) is unique per (vec_id, s), so min(struct) IS the
    # row_number()==1 row; the former window shape paid a full
    # exchange+sort of the N×M×CODES candidate stream where a map-side-
    # combinable aggregate suffices (the r10 sim_pq_refresh lesson,
    # applied to the search/eval route).
    encoded = (
        v_sub.join(F.broadcast(cb_sub), "s")
        .withColumn("sub_d2", _pq_subd2(F.col("v8"), F.col("cv8")))
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("sub_d2", "code")).alias("m"))
        .select("vec_id", "s", F.col("m.code").alias("code"))
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
    # ADC shortlist -> exact re-rank (the standard PQ pipeline): raw
    # vectors are touched only for _PQ_SHORTLIST candidates per query.
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
        .filter(F.col("rn") <= _K)
        .select("query_id", "neighbor_id", "l2_d2")
    )


# --- measured PQ recall (the sim_ivf_eval twin on the L2 metric) ------------------


def _l2_topk(q: DataFrame, query_pred=None) -> DataFrame:
    """Exact squared-L2 brute-force top-_K over a ``(vec_id, qv)`` frame
    — the ground truth the PQ route approximates (queries broadcast, the
    vector table scanned once, never shuffled)."""
    if query_pred is None:
        query_pred = F.col("vec_id") < _N_QUERIES
    qq = q.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qv_q")
    )
    nn = q.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qv_n"))
    scored = (
        F.broadcast(qq)
        .join(nn, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("l2_d2", _pq_subd2(F.col("qv_q"), F.col("qv_n")))
    )
    w = Window.partitionBy("query_id").orderBy("l2_d2", "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .select("query_id", "neighbor_id", "l2_d2")
    )


def _pq_eval_oracle(qpred_v: str, qpred_a: str) -> str:
    """PQ-eval oracle with the query-set predicate injected into the PQ
    route's LUT (alias ``v``) and the exact-L2 truth (alias ``a``)."""
    return f"""
WITH {_pq_ctes(qpred_v)},
pq AS (
  SELECT query_id, neighbor_id, 1 AS in_p
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY l2_d2, neighbor_id) AS rn
        FROM rerank) t
  WHERE rn <= {_K}
),
tscored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST({_PQ_SUBD2.format(a='a.qv', b='b.qv')} AS BIGINT) AS l2_d2
  FROM q a JOIN q b ON b.vec_id <> a.vec_id
  WHERE {qpred_a}
),
truth AS (
  SELECT query_id, neighbor_id, 1 AS in_t
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY l2_d2, neighbor_id) AS rn
        FROM tscored) t
  WHERE rn <= {_K}
)
SELECT query_id,
       CAST(COUNT(in_t) AS BIGINT) AS n_truth,
       CAST(COUNT(in_p) AS BIGINT) AS n_pq,
       CAST(COUNT(CASE WHEN in_t IS NOT NULL AND in_p IS NOT NULL THEN 1 END) AS BIGINT) AS n_hit,
       CAST(COUNT(CASE WHEN in_t IS NOT NULL AND in_p IS NULL THEN 1 END) AS BIGINT) AS missed,
       CAST(CASE WHEN COUNT(in_t) = 0 THEN 0
            ELSE (COUNT(CASE WHEN in_t IS NOT NULL AND in_p IS NOT NULL THEN 1 END) * 1000000)
                 // COUNT(in_t) END AS BIGINT) AS recall_micro
FROM truth FULL JOIN pq USING (query_id, neighbor_id)
GROUP BY query_id
"""


_PQ_EVAL_ORACLE = _pq_eval_oracle(
    f"v.vec_id < {_N_QUERIES}", f"a.vec_id < {_N_QUERIES}"
)


def _pq_eval_df(
    spark: SparkSession, sf_dir: str, query_pred=None, query_k: int | None = None
) -> DataFrame:
    """Measured PQ quality — ``sim_ivf_eval``'s twin on the L2 metric:
    per-query recall@5 of the PQ route (``_pq_topk``: 8×16 codebooks,
    ADC shortlist 50, exact re-rank) against the exact squared-L2
    brute-force truth (``_l2_topk``), as integer micros via truncating
    DIV. Together the two eval queries make the quality/speed trade of
    BOTH ANN indexes (IVF on cosine, PQ on L2) measured artifacts.

    Same single-pass shape as ``sim_ivf_eval``: one shared quantized
    upstream frame, one full-outer equi-join on the (query, neighbor)
    pair key, every count folded in one map-side-combinable aggregate."""
    e = load(spark, sf_dir, "embeddings")
    # shared-frame checkpoint (r13): the PQ route consumes the quantized
    # corpus five times (see sim_pq_search) and the exact-L2 truth route
    # two more — one materialization, seven reads.
    q = materialize(e.select("vec_id", quantize(F.col("embedding")).alias("qv")))
    if query_k is not None:
        query_pred = F.col("vec_id").isin(_sampled_ids(q, query_k))
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


@register("sim_pq_eval", oracle=_PQ_EVAL_ORACLE, tags=("similarity", "eval"))
def sim_pq_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_eval_df(spark, sf_dir)


sim_pq_eval.__doc__ = _pq_eval_df.__doc__


@register(
    "sim_pq_eval_sampled",
    oracle=_pq_eval_oracle(
        _sql_sampled_in("v.vec_id", "q"), _sql_sampled_in("a.vec_id", "q")
    ),
    tags=("similarity", "eval", "sample"),
)
def sim_pq_eval_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sim_pq_eval`` over the SAMPLED query set (same hash-rank K as
    ``sim_ivf_eval_sampled``): the exact-L2 truth route costs exactly
    O(K·N), the measurement semantics and the full oracle check are
    unchanged — the production form of the PQ recall eval."""
    return _pq_eval_df(spark, sf_dir, query_k=_EVAL_SAMPLE_K)


# --- incremental PQ index refresh --------------------------------------------------

# Content-addressed corpus split for the PQ maintenance scenario (the
# sim_ivf_refresh construction with its own prefix, so the two maintenance
# queries see different appended batches).
_PQR_COIN_PREFIX = "pqnew"
_PQR_COIN_MOD = 4

_SQL_PQR_COIN = (
    f"CAST('0x' || substr(md5('{_PQR_COIN_PREFIX}|' || "
    f"CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % {_PQR_COIN_MOD} = 0"
)

_PQ_REFRESH_ORACLE = f"""
WITH basev AS (
  SELECT vec_id, {sql_quantize('embedding')} AS qv
  FROM embeddings WHERE NOT ({_SQL_PQR_COIN})
),
newv AS (
  SELECT vec_id, {sql_quantize('embedding')} AS qv
  FROM embeddings WHERE ({_SQL_PQR_COIN})
),
seeds AS (SELECT vec_id FROM basev ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_PQ_CODES}),
cb AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, qv
  FROM basev WHERE vec_id IN (SELECT vec_id FROM seeds)
),
ss AS (SELECT unnest(range(0, {_PQ_M})) AS s),
cb_sub AS (
  SELECT cb.code, ss.s, cb.qv[ss.s * {_PQ_DSUB} + 1 : (ss.s + 1) * {_PQ_DSUB}] AS cv8
  FROM cb CROSS JOIN ss
),
bsub AS (
  SELECT b.vec_id, ss.s, b.qv[ss.s * {_PQ_DSUB} + 1 : (ss.s + 1) * {_PQ_DSUB}] AS v8
  FROM basev b CROSS JOIN ss
),
benc AS (
  SELECT vec_id, s, code, v8 FROM (
    SELECT v.vec_id, v.s, c.code, v.v8,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY {_PQ_SUBD2.format(a='v.v8', b='c.cv8')}, c.code) AS rn
    FROM bsub v JOIN cb_sub c ON c.s = v.s) t
  WHERE rn = 1
),
nsub AS (
  SELECT nv.vec_id, ss.s, nv.qv[ss.s * {_PQ_DSUB} + 1 : (ss.s + 1) * {_PQ_DSUB}] AS v8
  FROM newv nv CROSS JOIN ss
),
nenc AS (
  SELECT vec_id, s, code, v8 FROM (
    SELECT v.vec_id, v.s, c.code, v.v8,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY {_PQ_SUBD2.format(a='v.v8', b='c.cv8')}, c.code) AS rn
    FROM nsub v JOIN cb_sub c ON c.s = v.s) t
  WHERE rn = 1
),
bcnt AS (SELECT s, code, CAST(COUNT(*) AS BIGINT) AS n_base FROM benc GROUP BY s, code),
ncnt AS (SELECT s, code, CAST(COUNT(*) AS BIGINT) AS n_new FROM nenc GROUP BY s, code),
decide AS (
  SELECT c.s, c.code,
         COALESCE(b.n_base, 0) AS n_base,
         COALESCE(n.n_new, 0) AS n_new,
         CASE WHEN COALESCE(n.n_new, 0) > 0
                   AND {_REFRESH_DEN} * COALESCE(n.n_new, 0)
                       >= {_REFRESH_NUM} * COALESCE(b.n_base, 0)
              THEN 1 ELSE 0 END AS refreshed
  FROM cb_sub c
  LEFT JOIN bcnt b ON b.s = c.s AND b.code = c.code
  LEFT JOIN ncnt n ON n.s = c.s AND n.code = c.code
),
members AS (
  SELECT e.s, e.code, e.v8 FROM benc e
  JOIN decide d ON d.s = e.s AND d.code = e.code AND d.refreshed = 1
  UNION ALL
  SELECT e.s, e.code, e.v8 FROM nenc e
  JOIN decide d ON d.s = e.s AND d.code = e.code AND d.refreshed = 1
),
rmean AS (
  SELECT s, code, CAST(SUM(v8[1]) AS BIGINT) // COUNT(*) AS r0
  FROM members GROUP BY s, code
)
SELECT CAST(d.s AS BIGINT) AS s, d.code, d.n_base, d.n_new,
       CAST(d.refreshed AS BIGINT) AS refreshed,
       CAST(CASE WHEN d.refreshed = 1 THEN r.r0 ELSE c.cv8[1] END AS BIGINT) AS code_c0
FROM decide d
JOIN cb_sub c ON c.s = d.s AND c.code = d.code
LEFT JOIN rmean r ON r.s = d.s AND r.code = d.code
ORDER BY s, d.code
"""


@register(
    "sim_pq_refresh",
    oracle=_PQ_REFRESH_ORACLE,
    tags=("similarity", "maintenance"),
)
def sim_pq_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PQ index refresh — ``sim_ivf_refresh``'s twin on the
    code-table index, completing the round-10 maintenance family (text
    index, LSH index, IVF cells, PQ codebooks): given a BASE corpus whose
    8×16 codebooks and code table are the standing index
    (content-addressed md5 split of the embeddings), ENCODE the appended
    batch against the EXISTING codebooks map-side (one broadcast of
    8×16 subvector rows against O(new·M) exploded rows — the cheap step;
    no codebook re-train, exactly how a production PQ index absorbs
    appends), then re-center ONLY the (subspace, code) cells whose
    appended count crossed the threshold (appended ≥ 20% of the cell's
    indexed members, and at least one appended member). One row per cell:
    base/new member counts, the refresh decision, and the first
    component of the post-maintenance code vector (exact truncating-DIV
    integer mean — identical in both engines), so the entire maintenance
    pass hash-checks against the DuckDB oracle.

    Scale shape: the appended batch costs O(new·M) broadcast-joined rows,
    folded by ONE map-side-combinable hash aggregate into per-cell
    (count, component-sum) stats — the decision AND the re-centered mean
    both come out of that O(M·CODES) stats frame, so there is no second
    members pass at all and a quiet index costs O(new rows), never
    O(corpus). The base encode here recomputes what a standing deployment
    reads from its stored code-table stats (the persisted-index argument
    of ``fuzzy_dedup.lsh_base_index``); its cost is the amortized index
    build, not the maintenance pass."""
    e = load(spark, sf_dir, "embeddings")
    from .data_selection import _md5_coin

    is_new = _md5_coin(_PQR_COIN_PREFIX, F.col("vec_id"), _PQR_COIN_MOD) == 0
    allq = e.select(
        "vec_id", quantize(F.col("embedding")).alias("qv"), is_new.alias("is_new")
    )
    base = allq.filter(~F.col("is_new")).select("vec_id", "qv")
    newv = allq.filter(F.col("is_new")).select("vec_id", "qv")
    # codebooks from the BASE corpus only (the standing index): the
    # _PQ_CODES md5-smallest base vec_ids. ONE tiny driver collect — the
    # top-k carries qv along (r13: the former isin(seed_ids) re-filter
    # paid a second full base scan + collect; same fix as _pq_topk's r12
    # codebook build).
    seed_rows = (
        base.select(
            "vec_id", "qv", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(_PQ_CODES)
        .collect()
    )
    cb_rows = [
        (code, r["qv"])
        for code, r in enumerate(sorted(seed_rows, key=lambda r: r["vec_id"]))
    ]
    cb = spark.createDataFrame(cb_rows, "code LONG, qv ARRAY<LONG>")
    subspaces = F.array(
        *[F.slice("qv", s * _PQ_DSUB + 1, _PQ_DSUB) for s in range(_PQ_M)]
    )
    cb_sub = cb.select("code", F.posexplode(subspaces).alias("s", "cv8"))

    def encode_stats(frame: DataFrame) -> DataFrame:
        """Encode a (vec_id, qv) frame against the broadcast codebooks and
        fold straight into per-(s, code) stats: member count + sum of the
        reported component. The argmin is ONE hash aggregate —
        min(struct(d2, code, v8)) with (d2, code) unique per (vec_id, s),
        so ties never reach v8 — instead of a row_number window (no
        shuffle+sort of the N·M·CODES candidate stream; partials combine
        map-side). Per-cell sums make the gated members re-read
        unnecessary: count and component-sum for EVERY cell come out of
        the same aggregate, and the refreshed mean is (sb+sn) DIV (nb+nn)
        — identical to averaging the members directly, so the oracle's
        members-based CTE is unchanged."""
        v_sub = frame.select("vec_id", F.posexplode(subspaces).alias("s", "v8"))
        enc = (
            v_sub.join(F.broadcast(cb_sub), "s")
            .groupBy("vec_id", "s")
            .agg(
                F.min(
                    F.struct(
                        _pq_subd2(F.col("v8"), F.col("cv8")).alias("d2"),
                        F.col("code").alias("code"),
                        F.col("v8").alias("v8"),
                    )
                ).alias("m")
            )
            .select("s", F.col("m.code").alias("code"), F.col("m.v8").alias("v8"))
        )
        return enc.groupBy("s", "code").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum(F.col("v8")[0]).alias("sv0")
        )

    bstat = encode_stats(base)
    nstat = encode_stats(newv)
    decide = (
        cb_sub.select("s", "code", "cv8")
        .join(bstat.withColumnsRenamed({"cnt": "nb", "sv0": "sb"}), ["s", "code"], "left")
        .join(nstat.withColumnsRenamed({"cnt": "nn", "sv0": "sn"}), ["s", "code"], "left")
        .select(
            "s",
            "code",
            "cv8",
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("nn", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("sb", F.lit(0)).cast("long").alias("sb"),
            F.coalesce("sn", F.lit(0)).cast("long").alias("sn"),
        )
        .withColumn(
            "refreshed",
            F.when(
                (F.col("n_new") > 0)
                & (
                    F.lit(_REFRESH_DEN) * F.col("n_new")
                    >= F.lit(_REFRESH_NUM) * F.col("n_base")
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return decide.select(
        F.col("s").cast("long").alias("s"),
        "code",
        "n_base",
        "n_new",
        "refreshed",
        F.when(
            F.col("refreshed") == 1,
            F.expr("(sb + sn) DIV (n_base + n_new)"),
        )
        .otherwise(F.col("cv8")[0])
        .cast("long")
        .alias("code_c0"),
    ).orderBy("s", "code")
