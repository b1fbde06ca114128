"""Scale techniques as first-class, verified operators — the "would this
survive 100 TB?" toolbox: key salting for skewed joins and AQE-driven skew
handling. (Bucketed co-located joins are exercised in
tests/test_bucketing.py — they need table writes, which driver-contract
queries must not do.)

The salted join is oracle-checked: salting is a pure execution-strategy
rewrite, so its RESULT must equal the plain join the oracle computes —
exactly the property worth asserting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from ._determinism import fixed_sum, sql_fixed_sum

_N_SALTS = 8

# Construct a deliberately skewed key: ~half of all lineitems collapse
# onto hot_key 0; the rest keep their order key. Both engines build the
# identical skewed dataset, so the oracle checks the salted join's result
# against a plain join on the same skew.
_SKEW_KEY_SQL = "CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE l_orderkey END"

_SALTED_ORACLE = f"""
WITH fact AS (
  SELECT {_SKEW_KEY_SQL} AS skew_key, l_extendedprice FROM lineitem
),
dim AS (
  SELECT o_orderkey AS skew_key, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1 OR o_orderkey = 0
  UNION ALL
  SELECT 0 AS skew_key, '0-HOT' AS o_orderpriority
)
SELECT d.o_orderpriority,
       COUNT(*) AS n_rows,
       {sql_fixed_sum('f.l_extendedprice', 100)} AS total_price
FROM fact f JOIN dim d ON d.skew_key = f.skew_key
GROUP BY d.o_orderpriority
ORDER BY d.o_orderpriority
"""


@register("scale_salted_skew_join", oracle=_SALTED_ORACLE, tags=("scale", "join"))
def scale_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join over a key where ~50% of rows share one value — with
    the salt applied ONLY to detected hot keys.

    Technique: fact rows of a hot key get `salt = crc32(unique) % S`; the
    hot slice of the dim side is exploded S× with every salt, and that
    join runs on (key, salt) — the hot key's rows spread across S
    reducers instead of one. Everything else joins PLAIN and the two
    streams union. The oracle is the UNSALTED join: identical results
    prove the rewrite is semantics-preserving.

    Hot-key detection: a content-addressed 1% sample
    (xxhash64 % 100 == 0 — deterministic across runs/engines/retries,
    repo-standard coin) counted per key; keys whose estimated rows exceed
    ~5% of the fact table are hot. Correctness does NOT depend on the
    detected set — the hot/cold split is semantics-preserving for ANY
    partition of the keys; detection only decides who pays the salt.

    Why the split matters (sf100 probe): the round-7 shape salted
    EVERYTHING — exploding the whole 75M-row dim side 8× at sf100 put
    ~600M manufactured dim rows through the shuffle and ran 241 s; the
    technique's cost must scale with the SKEW, not the dim. Post-split,
    the exploded slice is S rows per hot key. At 100 TB this (or AQE
    skew-join, enabled in session.py, which performs exactly this split
    from shuffle statistics) is the difference between a straggler task
    holding the stage for hours and even progress."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    fact = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("skew_key"),
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
    )
    dim = o.filter((F.col("o_orderkey") % 2 == 1) | (F.col("o_orderkey") == 0)).select(
        F.col("o_orderkey").alias("skew_key"), "o_orderpriority"
    ).unionAll(
        spark.createDataFrame([(0, "0-HOT")], "skew_key LONG, o_orderpriority STRING")
    )

    n_fact = fact.count()  # parquet-stat-backed; one metadata-cheap job
    sample = fact.filter(
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(100)) == 0
    )
    hot = [
        r["skew_key"]
        for r in sample.groupBy("skew_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= max(5, n_fact // 2000))  # est. share ≥ ~5%
        .collect()
    ]

    cols = ["o_orderpriority", "l_extendedprice"]
    if hot:
        is_hot = F.col("skew_key").isin(hot)
        # Salt from the ROW identity (original orderkey+linenumber), not
        # the skewed key — a salt derived from low-cardinality columns
        # collapses to few buckets exactly on the hot key it must spread.
        salted_fact = fact.filter(is_hot).withColumn(
            "salt",
            F.crc32(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber")))
            % _N_SALTS,
        )
        salted_dim = dim.filter(is_hot).withColumn(
            "salt",
            F.explode(F.array(*[F.lit(s).cast("long") for s in range(_N_SALTS)])),
        )
        joined = (
            salted_fact.join(salted_dim, ["skew_key", "salt"])
            .select(*cols)
            .unionByName(fact.filter(~is_hot).join(dim.filter(~is_hot), "skew_key").select(*cols))
        )
    else:
        joined = fact.join(dim, "skew_key").select(*cols)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            fixed_sum(F.col("l_extendedprice"), 100).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


_REPART_ORACLE = """
SELECT l_suppkey, COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_suppkey
"""


@register("scale_repartition_agg", oracle=_REPART_ORACLE, tags=("scale",))
def scale_repartition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pre-partitioning on the aggregation key: `repartition(k)`
    then groupBy reuses the partitioning (no second shuffle) — the manual
    analog of bucketing for one-shot pipelines, and the pattern for
    reusing one shuffle across several downstream aggs."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.repartition(16, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


# --- bucketed interval-overlap join ------------------------------------------

_IVL_W = 7200  # bucket / campaign width (seconds)
_IVL_N = 40  # campaigns, 90-min stride → overlapping windows

_IVL_WALL_S = """
CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) * 86400
+ date_part('hour', ts) * 3600
+ date_part('minute', ts) * 60
+ date_part('second', ts)
"""

_INTERVAL_ORACLE = f"""
WITH ev AS (
  SELECT user_id,
         ({_IVL_WALL_S}) AS wall_s,
         ({_IVL_WALL_S}) // 86400 AS day
  FROM events
),
spans AS (
  SELECT user_id, day, MIN(wall_s) AS a_start, MAX(wall_s) + 1 AS a_end
  FROM ev GROUP BY user_id, day
),
t0 AS (SELECT MIN(a_start) AS t0 FROM spans),
campaigns AS (
  SELECT c.range AS campaign_id,
         t0.t0 + c.range * 5400 AS b_start,
         t0.t0 + c.range * 5400 + {_IVL_W} AS b_end
  FROM range(0, {_IVL_N}) c, t0
)
SELECT campaign_id,
       COUNT(*) AS n_spans,
       COUNT(DISTINCT user_id) AS n_users
FROM campaigns c JOIN spans s
  ON s.a_start < c.b_end AND c.b_start < s.a_end
GROUP BY campaign_id
ORDER BY campaign_id
"""


@register(
    "scale_interval_bucket_join", oracle=_INTERVAL_ORACLE, tags=("scale", "events")
)
def scale_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join via bucketing — the operator Spark has no
    native form of, in the shape that survives 100 TB. Per-(user, day)
    activity spans from the events table are joined to overlapping
    campaign windows (synthesized 2 h windows at 90 min stride).

    A naive theta join (``a_start < b_end AND b_start < a_end``) plans as
    a nested-loop over the full cross product — quadratic, the classic
    range-join trap. Instead both interval sets are EXPLODED into the
    fixed-width time buckets they touch (``sequence`` + ``explode``, a
    map-only expansion bounded by interval_length/bucket_width), joined
    with an EQUI-join on the bucket id, re-filtered on the true overlap
    predicate, and de-duplicated (a pair may share several buckets).
    Shuffle cost is O(intervals × buckets_touched), never O(|A|·|B|).
    The oracle runs the naive theta join — same result, different plan
    class. (DuckDB mirrors the same trick as its IEJoin; Spark's analog
    is exactly this rewrite.)"""
    e = load(spark, sf_dir, "events")
    from .windows import wall_seconds

    ev = e.select(
        "user_id", wall_seconds(F.col("ts")).alias("wall_s")
    ).withColumn("day", F.expr("wall_s DIV 86400"))
    spans = ev.groupBy("user_id", "day").agg(
        F.min("wall_s").alias("a_start"),
        (F.max("wall_s") + 1).alias("a_end"),
    )
    t0 = spans.agg(F.min("a_start").alias("t0"))
    campaigns = (
        spark.range(_IVL_N)
        .withColumnRenamed("id", "campaign_id")
        .crossJoin(F.broadcast(t0))
        .select(
            "campaign_id",
            (F.col("t0") + F.col("campaign_id") * 5400).alias("b_start"),
            (F.col("t0") + F.col("campaign_id") * 5400 + _IVL_W).alias("b_end"),
        )
    )
    spans_b = spans.withColumn(
        "bucket",
        F.explode(F.sequence(F.expr("a_start DIV %d" % _IVL_W), F.expr("(a_end - 1) DIV %d" % _IVL_W))),
    )
    camp_b = campaigns.withColumn(
        "bucket",
        F.explode(F.sequence(F.expr("b_start DIV %d" % _IVL_W), F.expr("(b_end - 1) DIV %d" % _IVL_W))),
    )
    pairs = (
        camp_b.join(spans_b, "bucket")
        .filter((F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end")))
        .select("campaign_id", "user_id", "day")
        .distinct()
    )
    return (
        pairs.groupBy("campaign_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("campaign_id")
    )


# --- z-order (Morton) data layout ------------------------------------------------

# Interleave the low 8 bits of two dimensions into a 16-bit Morton code.
# Pure integer shift/mask arithmetic, written identically in both engines,
# so the layout statistics are hash-verified bit-for-bit.
_Z_BITS = 8


def _z_interleave(x, y):
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


_Z_SQL = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS)
)

_ZORDER_ORACLE = f"""
WITH dims AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256 AS BIGINT) AS y
  FROM orders
),
z AS (SELECT x, y, CAST({_Z_SQL} AS BIGINT) AS zval FROM dims)
SELECT CAST(zval // 64 AS BIGINT) AS zcell,
       COUNT(*) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM z GROUP BY zcell ORDER BY zcell
"""


@register("scale_zorder_layout", oracle=_ZORDER_ORACLE, tags=("scale",))
def scale_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-code) layout statistics over two orders dimensions.

    Interleaves the low 8 bits of (o_custkey, order-day) into a 16-bit
    Morton code and reports, per 64-code z-cell, the row count and the
    min/max extent of BOTH source dimensions — the property that makes
    z-ordering useful: every cell is a small rectangle in (x, y) space, so
    parquet row-group min/max stats prune scans for predicates on EITHER
    dimension (multi-dimensional data skipping, the same layout trick behind
    Delta/Iceberg Z-ORDER table maintenance).

    At 100 TB the write path is `df.repartitionByRange(N, "zval")
    .sortWithinPartitions("zval")` before the parquet write (exercised in
    tests/test_zorder_layout.py); this query verifies the cell-extent
    invariant the skipping relies on. The code itself is pure integer
    shift/mask column arithmetic — whole-stage-codegen'd, no UDFs.
    """
    o = load(spark, sf_dir, "orders")
    dims = o.select(
        (F.col("o_custkey") % 256).cast("long").alias("x"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
            % 256
        ).cast("long").alias("y"),
    )
    z = dims.select("x", "y", _z_interleave(F.col("x"), F.col("y")).alias("zval"))
    return (
        z.groupBy(F.floor(F.col("zval") / 64).cast("long").alias("zcell"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("zcell")
    )
