"""Aggregation operator family (SURVEY.md §2.3 "Aggregation [implied]").

All Spark aggregates run partial→final automatically (map-side combine);
the shuffle carries one row per group per map partition, never raw rows.
Quantiles are computed by explicit rank selection (window + filter) in BOTH
engines so the semantics — and therefore the value hash — match exactly,
instead of trusting two engines' interpolation to agree to the last ulp.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register
from ._determinism import fixed_avg, fixed_sum, sql_fixed_avg, sql_fixed_sum

# --- basic stats -------------------------------------------------------------

_BASIC_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       {sql_fixed_sum('o_totalprice', 100)} AS sum_price,
       {sql_fixed_avg('o_totalprice', 100)} AS avg_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_basic_stats", oracle=_BASIC_ORACLE, tags=("agg",))
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            fixed_sum(F.col("o_totalprice"), 100).alias("sum_price"),
            fixed_avg(F.col("o_totalprice"), 100).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


# --- count distinct ----------------------------------------------------------

_CNTD_ORACLE = """
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer
GROUP BY c_nationkey
"""


@register("agg_count_distinct", oracle=_CNTD_ORACLE, tags=("agg",))
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark expands to a two-phase aggregate."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


_APPROX_CNTD_ORACLE = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_exact,
       TRUE AS within_5pct
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("agg_approx_count_distinct", oracle=_APPROX_CNTD_ORACLE, tags=("agg", "approx"))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate (ClickHouse `uniq` analog).

    HLL estimates are engine-specific by construction, so the raw estimate
    can't be hashed against DuckDB. Instead the query returns the exact
    count plus the *bounded-error assertion* (|approx−exact|/exact ≤ 5%,
    2.5× the requested rsd) as a column; the oracle expects literal TRUE,
    so the driver's hash check verifies the accuracy contract itself.
    At 100 TB the HLL sketch is THE distinct-count to use — constant
    memory per group vs. the exact version's per-key shuffle state.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_exact"),
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
        )
        .select(
            "o_orderstatus",
            "n_exact",
            (
                F.abs(F.col("approx_custs") - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                <= 0.05
            ).alias("within_5pct"),
        )
        .orderBy("o_orderstatus")
    )


# --- quantiles by explicit rank selection -------------------------------------

_QUANT_ORACLE = """
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*)    OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus,
       MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT) THEN o_totalprice END) AS median_price,
       MAX(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT) THEN o_totalprice END) AS p90_price
FROM ranked
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


_QUANT_BUCKETS = 1024
_QUANT_QS = (("median_price", 0.5), ("p90_price", 0.9))


@register("agg_quantiles", oracle=_QUANT_ORACLE, tags=("agg",))
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles via DISTRIBUTED rank selection — identical
    semantics to the oracle's window form (no interpolation drift), but
    never a per-status global sort: with only 3 order statuses, the naive
    window hashes ~a third of the table into ONE task's sort (241 s at
    the sf100 probe over 150M orders; unbounded at 100 TB). Standard
    distributed k-th selection instead:

    - phase 0: per-status count + price extent — one hash aggregate,
      O(statuses) rows to the driver;
    - phase 1: histogram over ``_QUANT_BUCKETS`` equal-width price
      buckets — one map-side-combinable aggregate, O(statuses·buckets)
      rows to the driver (bounded control-plane reads, same policy as
      kmeans' centroid stats);
    - the driver prefix-sums the histogram to locate, for each quantile
      rank k = ceil(n·q), its bucket and within-bucket offset;
    - phase 2: ONLY the target buckets (~n/buckets rows each) are
      re-scanned and sorted; row_number within (status, quantile) picks
      the offset element.

    Exactness: equal prices always share a bucket and bucketing is
    monotone in price, so (rows in earlier buckets) + (rank within the
    bucket by (price, orderkey)) IS the oracle's global rank — selection
    by rank is order-independent, hence hash-identical. Degenerate case:
    a single dominant price value concentrates its bucket (ties sort in
    one task) — bounded by the tie count, which no exact rank selection
    can avoid. ``percentile_approx`` remains the sketch path
    (``agg_percentile_approx``)."""
    import math

    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice", "o_orderkey"
    )
    stats = {
        r["o_orderstatus"]: (r["n"], float(r["lo"]), float(r["hi"]))
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .collect()
    }
    bounds = spark.createDataFrame(
        [
            (s, lo, ((hi - lo) / _QUANT_BUCKETS) or 1.0)
            for s, (n, lo, hi) in sorted(stats.items())
        ],
        "o_orderstatus STRING, lo DOUBLE, w DOUBLE",
    )
    bkt = F.least(
        F.lit(_QUANT_BUCKETS - 1),
        F.floor((F.col("o_totalprice") - F.col("lo")) / F.col("w")).cast("long"),
    )
    withb = o.join(F.broadcast(bounds), "o_orderstatus").withColumn("bkt", bkt)
    hist: dict[str, dict[int, int]] = {}
    for r in (
        withb.groupBy("o_orderstatus", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        hist.setdefault(r["o_orderstatus"], {})[r["bkt"]] = r["c"]
    targets = []  # (status, bucket, quantile name, within-bucket offset)
    for s, (n, _lo, _hi) in stats.items():
        ks = {name: math.ceil(n * q) for name, q in _QUANT_QS}
        cum = 0
        for b in sorted(hist.get(s, {})):
            c = hist[s][b]
            for name, k in ks.items():
                if cum < k <= cum + c:
                    targets.append((s, b, name, k - cum))
            cum += c
    tgt = spark.createDataFrame(
        targets, "o_orderstatus STRING, bkt LONG, which STRING, off LONG"
    )
    cand = withb.join(F.broadcast(tgt), ["o_orderstatus", "bkt"])
    wsel = Window.partitionBy("o_orderstatus", "which").orderBy(
        "o_totalprice", "o_orderkey"
    )
    picked = cand.withColumn("rn", F.row_number().over(wsel)).filter(
        F.col("rn") == F.col("off")
    )
    return (
        picked.groupBy("o_orderstatus")
        .agg(
            F.max(
                F.when(F.col("which") == "median_price", F.col("o_totalprice"))
            ).alias("median_price"),
            F.max(
                F.when(F.col("which") == "p90_price", F.col("o_totalprice"))
            ).alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


# --- collect_set / string_agg --------------------------------------------------

_COLLECT_ORACLE = """
SELECT r.r_name,
       STRING_AGG(DISTINCT n.n_name, '|' ORDER BY n.n_name) AS nations
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


@register("agg_collect_set", oracle=_COLLECT_ORACLE, tags=("agg",))
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArray/groupUniqArray analog: collect_set → sorted pipe-join so
    the result is order-insensitive and string-comparable."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_set("n_name"))).alias("nations")
        )
        .orderBy("r_name")
    )


# --- rollup / cube / grouping sets ---------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_customers,
       {sql_fixed_sum('c.c_acctbal', 100)} AS total_bal
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE, tags=("agg",))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            fixed_sum(F.col("c_acctbal"), 100).alias("total_bal"),
        )
    )


_CUBE_ORACLE = """
SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY CUBE (c.c_mktsegment, o.o_orderpriority)
"""


@register("agg_cube", oracle=_CUBE_ORACLE, tags=("agg",))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_GSETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("agg_grouping_sets", oracle=_GSETS_ORACLE, tags=("agg",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL surface (spark.sql over a temp view) —
    the engine's dual DataFrame/SQL contract (SURVEY.md §3.3)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --- pivot (cross-tab) -------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
# CAST each sum to BIGINT: DuckDB SUM(INTEGER) yields HUGEINT (int128),
# which a dtype-sensitive hash distinguishes from Spark's int64 count even
# when values match (root cause of the round-1 driver hash-red).
_PIVOT_CASES = ",\n       ".join(
    f"CAST(SUM(CASE WHEN c.c_mktsegment = '{s}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS {s.lower()}"
    for s in _SEGMENTS
)

_PIVOT_ORACLE = f"""
SELECT n.n_name,
       {_PIVOT_CASES}
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("agg_pivot", oracle=_PIVOT_ORACLE, tags=("agg",))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab: customers per (nation × market segment) via
    ``groupBy().pivot(values=...)``. Passing the value list explicitly
    matters at scale — without it Spark runs an extra distinct scan to
    discover pivot columns."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    piv = (
        n.join(c, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
    )
    # pivot emits NULL (not 0) for empty cells; align with the CASE-sum oracle
    out = piv.select(
        "n_name",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS],
    )
    return out.orderBy("n_name")


_GROUPING_ID_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("agg_grouping_id", oracle=_GROUPING_ID_ORACLE, tags=("agg",))
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers distinguish real NULL group keys from rollup
    subtotal rows — required for correct cube/rollup consumers."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n")
    )


# --- grouped-agg pandas UDF ---------------------------------------------------

# FLOOR(l_quantity) on both sides: DuckDB CAST(DOUBLE AS BIGINT) rounds
# to nearest while numpy astype truncates — identical only while
# quantities are integral (the driver regenerates data every round).
_WAVG_ORACLE = """
SELECT o_orderpriority,
       (CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(FLOOR(l.l_quantity) AS BIGINT)) AS DOUBLE)
        / SUM(CAST(FLOOR(l.l_quantity) AS BIGINT))) / 100.0 AS wavg_price
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _make_wavg_udf():
    """GROUPED_AGG pandas UDF (the aggregate-UDF surface): exact integer
    weighted sum per group, one deterministic division at the end — the
    same fixed-point discipline as the native aggregates, now crossing the
    Arrow boundary. Self-contained closure (executor import rule)."""
    from pyspark.sql.functions import pandas_udf as _pudf

    # Series → scalar type hints make pandas_udf infer GROUPED_AGG.
    # (`pd` must be a MODULE-global name: with `from __future__ import
    # annotations` the hints are strings resolved against fn.__globals__.)
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        import numpy as _np

        p = price.to_numpy() * 100.0
        cents = (_np.floor(_np.abs(p) + 0.5) * _np.sign(p)).astype(_np.int64)
        # floor, not astype-truncate: mirrors the oracle's FLOOR exactly
        # even if the regenerated data ever carries fractional quantities
        q = _np.floor(qty.to_numpy()).astype(_np.int64)
        # chunked exact accumulation: per-chunk int64 dots stay far from
        # overflow (|row product| < 2^40, chunk 1e6 rows < 2^60), chunk
        # sums accumulate as Python ints — exact at any group size
        total = 0
        for i in range(0, len(cents), 1_000_000):
            total += int(cents[i : i + 1_000_000] @ q[i : i + 1_000_000])
        return (total / int(q.sum())) / 100.0

    return _pudf(wavg, "double")


@register("agg_weighted_avg_pandas", oracle=_WAVG_ORACLE, tags=("agg", "udf"))
def agg_weighted_avg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per priority via a GROUPED_AGG
    pandas UDF — oracle-checked because the group partials are exact
    integers (order/batch independent) and the final division is written
    identically in both engines."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    wavg = _make_wavg_udf()
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(wavg(F.col("l_extendedprice"), F.col("l_quantity")).alias("wavg_price"))
        .orderBy("o_orderpriority")
    )


# --- mergeable HLL sketches (uniqCombined-state parity) -----------------------

_HLL_MERGE_ORACLE = """
SELECT o_orderstatus AS group_key,
       COUNT(DISTINCT o_custkey) AS n_exact,
       TRUE AS est_in_bounds
FROM orders
GROUP BY o_orderstatus
UNION ALL
SELECT 'ALL' AS group_key,
       COUNT(DISTINCT o_custkey) AS n_exact,
       TRUE AS est_in_bounds
FROM orders
ORDER BY group_key
"""


@register("agg_hll_mergeable", oracle=_HLL_MERGE_ORACLE, tags=("agg", "approx"))
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HLL sketch states (ClickHouse `uniqCombinedState` /
    `uniqCombinedMerge` parity): build one Datasketches HLL sketch per
    order status with ``hll_sketch_agg``, then MERGE the per-group binary
    states with ``hll_union_agg`` into the global estimate — never
    re-touching the raw rows. Mergeability is the property that matters at
    100 TB: per-partition sketches combine associatively, so distinct
    counts roll up across days/shards without a global shuffle of keys.

    Estimates are engine-specific, so (same pattern as
    ``agg_approx_count_distinct``) each row carries the exact count plus
    the bounded-error assertion — INCLUDING the 'ALL' row whose estimate
    came only from the merged sketches; the oracle expects literal TRUE,
    making both the accuracy and the merge path driver-hashable."""
    o = load(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sketch"),
    )
    per_group = per_group.localCheckpoint(eager=False)  # build sketches once
    groups = per_group.select(
        F.col("o_orderstatus").alias("group_key"),
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("sketch") - F.col("n_exact"))
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("est_in_bounds"),
    )
    merged = (
        per_group.agg(F.hll_union_agg("sketch").alias("sketch"))
        .crossJoin(
            o.agg(F.countDistinct("o_custkey").alias("n_exact"))
        )
        .select(
            F.lit("ALL").alias("group_key"),
            "n_exact",
            (
                F.abs(F.hll_sketch_estimate("sketch") - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                <= 0.05
            ).alias("est_in_bounds"),
        )
    )
    return groups.unionByName(merged).orderBy("group_key")


# --- correlation / covariance from exact integer moments ---------------------

_CORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS HUGEINT) AS sum_q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
              AS HUGEINT) AS sum_p,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
              AS HUGEINT) AS sum_qp,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
                  * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS HUGEINT) AS sum_qq,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
              AS HUGEINT) AS sum_pp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(sum_q AS BIGINT) AS sum_q,
       CAST(sum_p AS BIGINT) AS sum_p,
       CAST(n * sum_qp - sum_q * sum_p AS VARCHAR) AS cov_num,
       CAST(n * sum_qq - sum_q * sum_q AS VARCHAR) AS den_q,
       CAST(n * sum_pp - sum_p * sum_p AS VARCHAR) AS den_p
FROM m
ORDER BY l_returnflag
"""


@register("agg_corr_covar", oracle=_CORR_ORACLE, tags=("agg",))
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance of (quantity, price)
    per return flag — emitted in EXACT integer/rational form. Built-in
    corr()/covar_pop() sum doubles in shuffle order (nondeterministic
    last-ulp, catastrophic cancellation at 100 TB row counts); instead the
    five moments are integer sums and the statistics are emitted as the
    exact integers that determine them:

        covar_pop = cov_num / n²
        corr      = cov_num / sqrt(den_q · den_p)

    with cov_num = n·Σqp − Σq·Σp, den_q = n·Σqq − (Σq)², den_p =
    n·Σpp − (Σp)². No transcendental ever reaches the hashed output
    (round-4 lesson: a 1e-6-quantized sqrt double rounds differently
    across engine builds at .5 midpoints); the float evaluation is a
    pytest bounded-error contract (tests/test_exact_moments.py).

    Scale: per-row products fit long (q ≤ 5e1, p ≤ 1e7 cents → qp ≤ 5e8,
    p² ≤ 1e14), but Σp² wraps int64 near 9e4 worst-case rows per group, so
    the sums accumulate as decimal(38,0) (Spark's 128-bit path, matching
    DuckDB's HUGEINT) — exact through ~1e24 rows per group; the derived
    n·Σpp stays within 38 digits up to ~1e12 rows per group, emitted as
    canonical digit strings so both engines agree byte-for-byte at any
    magnitude. Still a single map-side-combine hash aggregate."""
    li = load(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity")).cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(q.cast(dec)).cast(dec).alias("sum_q"),
        F.sum(p.cast(dec)).cast(dec).alias("sum_p"),
        F.sum((q * p).cast(dec)).cast(dec).alias("sum_qp"),
        F.sum((q * q).cast(dec)).cast(dec).alias("sum_qq"),
        F.sum((p * p).cast(dec)).cast(dec).alias("sum_pp"),
    )
    n, sq, sp = F.col("n"), F.col("sum_q"), F.col("sum_p")
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        sq.cast("long").alias("sum_q"),
        sp.cast("long").alias("sum_p"),
        (n * F.col("sum_qp") - sq * sp).cast(dec).cast("string").alias("cov_num"),
        (n * F.col("sum_qq") - sq * sq).cast(dec).cast("string").alias("den_q"),
        (n * F.col("sum_pp") - sp * sp).cast(dec).cast("string").alias("den_p"),
    ).orderBy("l_returnflag")


# --- ordered string aggregation (groupArray / listagg parity) -----------------

_STRING_AGG_ORACLE = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
         AS priorities,
       COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("agg_string_agg", oracle=_STRING_AGG_ORACLE, tags=("agg",))
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (ClickHouse groupUniqArray / ANSI
    listagg parity): distinct order priorities per status, joined in
    sorted order. collect_set gathers engine-arbitrary order, so the
    deterministic form is array_sort BEFORE concat — the same
    total-order discipline every LIMIT query in this repo follows."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("o_orderpriority"))
            ).alias("priorities"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


# --- exact interpolated quantiles, integer-certified ----------------------------

# ClickHouse quantileExact / medianExact analog. Both engines interpolate at
# pos = q*(n-1); with integer cents and q in {.25, .5, .75} the interpolated
# value is an exact multiple of 1/4, so 4x (2x for the median) is an exact
# integer — no float ever reaches the hashed output (round-4 lesson).
_MEDIAN_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(2 * quantile_cont(CAST(ROUND(value * 100, 0) AS BIGINT), 0.5), 0)
            AS BIGINT) AS med2_cents,
       CAST(ROUND(4 * quantile_cont(CAST(ROUND(value * 100, 0) AS BIGINT), 0.25), 0)
            AS BIGINT) AS q25x4_cents,
       CAST(ROUND(4 * quantile_cont(CAST(ROUND(value * 100, 0) AS BIGINT), 0.75), 0)
            AS BIGINT) AS q75x4_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_median_exact", oracle=_MEDIAN_ORACLE, tags=("agg", "events"))
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median / quartiles per event type (ClickHouse quantileExact,
    vs the sketch-based agg_percentile_approx). Spark's exact percentile()
    and DuckDB's quantile_cont share the pos = q*(n-1) linear-interpolation
    convention; on integer cents the result is an exact multiple of 1/4,
    certified by emitting 2x/4x as BIGINT. Exact quantiles need the full
    per-group value multiset (one shuffle); at 100 TB grades into
    percentile_approx — both are provided."""
    e = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(2 * F.percentile(cents, F.lit(0.5)))
            .cast("long")
            .alias("med2_cents"),
            F.round(4 * F.percentile(cents, F.lit(0.25)))
            .cast("long")
            .alias("q25x4_cents"),
            F.round(4 * F.percentile(cents, F.lit(0.75)))
            .cast("long")
            .alias("q75x4_cents"),
        )
        .orderBy("event_type")
    )


# --- mergeable per-key map aggregation (ClickHouse sumMap analog) ---------------

# sumMap(k, v) merges {key -> sum} maps associatively per group. Spark shape:
# pre-aggregate (day, key), then fold the per-key rows into ONE canonical
# sorted map per day, serialized "key:count:cents" — deterministic, engine-
# neutral, and exactly the state a MergeTree AggregatingMergeTree rollup
# would store. Two partial->final hash aggregates, no extra shuffle beyond
# the grouping keys.
_SUM_MAP_ORACLE = """
WITH g AS (
  SELECT CAST(ts AS DATE) AS day,
         event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  GROUP BY 1, 2
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       string_agg(event_type || ':' || n || ':' || cents, ',' ORDER BY event_type)
         AS sum_map
FROM g
GROUP BY day
ORDER BY day
"""


@register("agg_sum_map", oracle=_SUM_MAP_ORACLE, tags=("agg", "events"))
def agg_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day {event_type -> (count, cents)} map rollup — the ClickHouse
    ``sumMap``/``countMap`` combinator (backend-implied surface, SURVEY.md
    SS2.3). The map is emitted in canonical key-sorted serialized form so
    the hash is order-independent."""
    e = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = e.groupBy(
        F.col("ts").cast("date").alias("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
    return (
        g.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("event_type", "n", "cents"))
                    ),
                    lambda x: F.concat_ws(
                        ":", x["event_type"], x["n"].cast("string"), x["cents"].cast("string")
                    ),
                ),
                ",",
            ).alias("sum_map"),
        )
        .orderBy("day")
    )
