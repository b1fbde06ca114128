"""Iterative graph analytics over the relational tables — PageRank on the
customer–supplier purchase graph.

Second proof (after kmeans.py's Lloyd loop) that ITERATIVE algorithms fit
this engine's exactness contract: every iteration is pure integer
arithmetic (fixed-point ranks, floor-division damping), so a fixed number
of iterations UNROLLS into plain SQL and the whole algorithm
hash-compares against DuckDB — while the Spark side builds the same
fixed-point loop as a chained DataFrame DAG, the shape Spark's own
PageRank examples use.

Scale shape per iteration (the 100 TB contract):
- contributions: one equi-join of the rank table onto the edge list
  (shuffle on src), then one hash aggregate on dst — the standard
  vertex-centric message-passing round. Ranks are O(V), edges O(E);
  nothing else is materialized.
- the edge list is built ONCE (distinct customer–supplier pairs from the
  order lines) and reused across iterations; on a cluster it would be
  bucketed by src so every iteration's join is shuffle-free.
- damping uses integer floor ops only: r' = floor(0.15·S₀/N) +
  floor(0.85·Σ floor(r_src/deg_src)) at scale 1e9 — no float ever enters
  the state, so iterations are bit-identical in any engine or partition
  order. (Rank mass leaks a few units per floor — identically in both
  engines; PageRank's ordering, the thing consumers use, is unaffected.)

Reference basis: PageRank (Page et al. 1999); the reference repo has no
graph surface — this is part of the beyond-reference analytics layer
(SURVEY.md §2.3 Layer C extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from ._materialize import materialize

_PR_ITERS = 5
_PR_SCALE = 1_000_000_000  # fixed-point: initial total mass = N × 1e9 / N
_PR_TOPK = 25

# Broadcast the O(V) rank table only while it is actually small. Each rank
# row is a (long, long) pair — ~16 B of data, ~50 B serialized with row
# overhead — so 20M nodes ≈ 1 GB broadcast, already past comfortable
# executor/driver budgets and a quarter of Spark's 8 GB hard cap. Above the
# threshold the hint is DROPPED and the iteration falls back to shuffle
# joins against the src-partitioned edge table (the standard vertex-centric
# shape): edges are repartitioned by src ONCE before the checkpoint, so
# every iteration only shuffles the O(V) rank side, never the O(E) edges.
_PR_BROADCAST_MAX_NODES = 2_000_000

# Bipartite purchase graph: an undirected edge per DISTINCT
# (customer, supplier) pair that shares at least one order line, expressed
# as two directed edges. Node ids: customers as 2·c_custkey, suppliers as
# 2·s_suppkey+1 (disjoint integer spaces).
_EDGES_SQL = """
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT DISTINCT l.l_suppkey * 2 + 1 AS src, o.o_custkey * 2 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def _pagerank_sql(iters: int = _PR_ITERS) -> str:
    """Unrolled integer PageRank CTE chain; final relation rank{iters}
    with columns (node, rank)."""
    parts = [
        f"edges0 AS ({_EDGES_SQL})",
        "nodes AS (SELECT DISTINCT src AS node FROM edges0)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges0 GROUP BY src)",
        # degree folded into the edge list ONCE — every iteration's
        # message round is then a single join (mirrors the Spark side's
        # checkpointed edges-with-degree table)
        "edges AS (SELECT e.src, e.dst, d.deg FROM edges0 e JOIN deg d USING (src))",
        f"rank0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""contrib{i} AS (
  SELECT e.dst AS node, CAST(SUM(r.rank // e.deg) AS BIGINT) AS c
  FROM edges e
  JOIN rank{i - 1} r ON r.node = e.src
  GROUP BY e.dst)"""
        )
        parts.append(
            f"""rank{i} AS (
  SELECT n.node,
         CAST({(15 * _PR_SCALE) // 100} AS BIGINT)
           + (85 * COALESCE(c.c, CAST(0 AS BIGINT))) // 100 AS rank
  FROM nodes n LEFT JOIN contrib{i} c ON c.node = n.node)"""
        )
    return ",\n".join(parts)


_PAGERANK_ORACLE = f"""
WITH {_pagerank_sql()}
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       (node - node % 2) // 2 AS entity_key,
       CAST(rank AS BIGINT) AS rank
FROM rank{_PR_ITERS}
ORDER BY rank DESC, node
LIMIT {_PR_TOPK}
"""


def _pagerank_df(
    spark: SparkSession,
    sf_dir: str,
    broadcast_max_nodes: int = _PR_BROADCAST_MAX_NODES,
) -> DataFrame:
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
    # Join-strategy gate BEFORE the checkpoint, so each branch stores the
    # O(E) table exactly ONCE (the first shape checkpointed it, counted,
    # then re-checkpointed src-partitioned in the fallback — pinning 2×
    # the largest table in executor storage for the query lifetime).
    # The gate needs only an UPPER BOUND on |V|, and two column-pruned
    # distinct counts bound it without building any edge: every node is a
    # customer with ≥1 order or a supplier with ≥1 lineitem. Same gate
    # pattern as kmeans auto-k — broadcast the O(V) rank table while it
    # fits, else shuffle-join it against src-partitioned edges so the
    # O(E) side still never moves per iteration.
    # one job for both distinct counts (r12: the two separate .count()
    # actions each paid a full job launch for a bound that one union +
    # aggregate computes). countDistinct ignores NULLs where the old
    # distinct().count() counted a NULL group — benign here because
    # o_custkey / l_suppkey are non-null by the TPC-H FK contract (and a
    # NULL key could never form an edge: the equi-join below drops it),
    # so the bound is unchanged on any corpus this engine loads.
    n_nodes = (
        o.select((F.col("o_custkey") * 2).alias("n"))
        .unionAll(li.select((F.col("l_suppkey") * 2 + 1).alias("n")))
        .agg(F.countDistinct("n").alias("c"))
        .collect()[0]["c"]
    )
    joined = edges0.join(deg, "src")
    if n_nodes <= broadcast_max_nodes:
        rank_side = F.broadcast
        # degree folded in ONCE, then materialized: every iteration's
        # message round is one join against this checkpointed table
        # (r13: via materialize() — conf-gated reliable checkpoint)
        edges = materialize(joined, storage=None)
    else:
        rank_side = lambda df: df  # noqa: E731 — AQE plans the shuffle join
        # The cluster answer to the message-round join: persist the O(E)
        # edge table ONCE as a src-BUCKETED, src-sorted parquet table, so
        # every iteration's sort-merge join reads edges already
        # partitioned AND sorted on the join key — only the O(V) rank
        # exchange moves per round, and the edge side is never
        # re-shuffled or re-sorted. This replaced a src-repartitioned
        # localCheckpoint whose partitioning Catalyst could not always
        # line up with the per-iteration join (the sf100 probe measured
        # 5 × ~800M-row exchange/sort rounds — the one >10×/decade query
        # in the round-8 probe); a bucketed scan's HashPartitioning is a
        # catalog fact the planner trusts across all iterations. Bucket
        # count scales with the node bound (~edges/bucket stays
        # task-sized at any scale); the one-file-per-bucket repartition
        # before the write is what lets the scan also report the
        # per-bucket sort order (multi-file buckets forfeit it). The
        # table lives in its own namespace (catalog hygiene — metadata
        # probes list scoped namespaces of their own) under a
        # CALL-UNIQUE name, and is dropped before this function returns
        # (the ranks are eagerly materialized below, so nothing lazy
        # still references it) — a second concurrent or later call can
        # never overwrite a table another result still resolves.
        import uuid

        n_buckets = max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            n_nodes // 125_000,
        )
        cache_tbl = f"olap_pr_cache.edges_by_src_{uuid.uuid4().hex[:12]}"
        spark.sql("CREATE DATABASE IF NOT EXISTS olap_pr_cache")
        from olap_db_spark.sources._fs import delete_managed_location

        # pre-clean is a no-op for the fresh unique name unless a crashed
        # prior process left its directory behind under the same
        # warehouse (the in-memory catalog forgets tables across
        # sessions but their directories persist)
        delete_managed_location(spark, "olap_pr_cache", cache_tbl.split(".")[1])
        (
            joined.repartition(n_buckets, "src")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, "src")
            .sortBy("src")
            .saveAsTable(cache_tbl)
        )
        edges = spark.table(cache_tbl)
    # Materialize the O(V) node table ONCE (r12): left lazy, the
    # distinct-over-edges subtree is re-derived inside every iteration's
    # rank rebuild (left join) — 5 extra exchanges over the edge table in
    # the unrolled plan (measured: 16 exchanges → 11 at sf0.1). A (long)
    # per node, the same bounded O(V) state class as the final-rank
    # checkpoint in the fallback branch.
    nodes = materialize(
        edges.select(F.col("src").alias("node")).distinct()
    )
    # r13: the per-iteration rank table is ALGEBRAICALLY folded into the
    # next message round. rank_i(node) = K + (85·coalesce(c_i(node),0))
    # DIV 100 with K = floor(0.15·S) — a pure function of the contrib
    # aggregate — and every edge src IS a node, so the old per-iteration
    # pair {edges ⋈ rank (broadcast/shuffle) ; nodes ⟕ contrib
    # (SortMergeJoin: Exchange+Sort on BOTH sides)} collapses to ONE
    # edges ⟕ contrib join per round: the rank expression evaluates
    # inline on the joined stream and the O(V) rank table never
    # materializes inside the loop. nodes ⟕ contrib runs exactly once at
    # the end, to emit rank rows for message-less nodes too. (A first r13
    # cut that kept the per-iteration rebuild but broadcast `contrib`
    # measured SLOWER than the SMJ shape — 5.8 vs 5.2 s interleaved: two
    # driver-serialized broadcast builds per round; this fold keeps ONE
    # broadcast per round and removes the second join outright. Plan:
    # 5 SortMergeJoin → 0 in the loop, Exchange 15 → 11.)
    _K_TELEPORT = (15 * _PR_SCALE) // 100
    _rank_expr = F.lit(_K_TELEPORT) + F.expr("(85 * COALESCE(c, 0)) DIV 100")
    contrib = None
    for _ in range(_PR_ITERS):
        if contrib is None:
            ranked = edges.withColumn("rank", F.lit(_PR_SCALE).cast("long"))
        else:
            ranked = edges.join(
                rank_side(contrib.withColumnRenamed("dst", "src")), "src", "left"
            ).withColumn("rank", _rank_expr)
        contrib = (
            ranked.select("dst", F.expr("rank DIV deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
    rank = (
        nodes.join(rank_side(contrib), nodes.node == contrib.dst, "left")
        .select("node", _rank_expr.alias("rank"))
    )
    if n_nodes > broadcast_max_nodes:
        # Materialize the O(V) final ranks eagerly (a (long, long) pair
        # per node — MB-scale even at sf100) so the bucketed edge cache
        # can be dropped NOW instead of leaking until session end: the
        # returned DataFrame no longer references spark.table(cache_tbl),
        # which closes the stale-serve window a fixed-name cache had
        # (a second _pagerank_df call used to overwrite the table before
        # the first result was consumed). SERIALIZED + disk-spillable per
        # the sf100 OOM lesson on deserialized unrolls.
        rank = materialize(rank)
        spark.sql(f"DROP TABLE IF EXISTS {cache_tbl}")
        delete_managed_location(spark, "olap_pr_cache", cache_tbl.split(".")[1])
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


@register("graph_pagerank_purchases", oracle=_PAGERANK_ORACLE, tags=("graph", "iterative"))
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 PageRank nodes of the customer–supplier purchase graph —
    'which suppliers sit at the center of the purchasing network', the
    influence-ranking shape behind seller/fraud analytics.

    Integer fixed-point damping (floor ops only, see module docstring)
    makes all 5 iterations bit-exact in both engines; the edge list is
    localCheckpoint'd once so the 5 join+agg rounds rescan a materialized
    table instead of re-deriving the distinct pairs. The rank broadcast is
    gated on a node-count threshold (``_PR_BROADCAST_MAX_NODES``) with a
    shuffle-join fallback over src-partitioned edges — both branches are
    oracle-identical (tests/test_graph_kl.py)."""
    return _pagerank_df(spark, sf_dir)
