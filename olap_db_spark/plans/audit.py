"""Physical-plan audit: assert the scale-critical plan properties instead
of eyeballing .explain output.

Run as a module for a report over the flagship queries:

    python -m olap_db_spark.plans.audit

Checked properties (the 100 TB checklist from the build brief):
- predicate pushdown reached the parquet scan (PushedFilters)
- column pruning (ReadSchema subset)
- small dims broadcast (BroadcastHashJoin), inline tables
  BroadcastNestedLoopJoin
- global top-k compiles to TakeOrderedAndProject (no full sort)
- aggregates run partial→final (map-side combine)
- AQE wraps the plan (runtime coalescing/skew handling)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has(df: DataFrame, needle: str) -> bool:
    return needle in plan_string(df)


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: ([^\n]*)", plan_string(df))


_FLAGSHIP_CHECKS = {
    "q1_pricing_summary": [
        ("filter pushdown", "PushedFilters: ["),
        ("partial aggregation", "partial_"),
    ],
    "q3_top_revenue_orders": [
        ("broadcast join", "BroadcastHashJoin"),
        ("top-k (no full sort)", "TakeOrderedAndProject"),
    ],
    "q5_local_supplier_volume": [
        ("broadcast join", "BroadcastHashJoin"),
        ("adaptive execution", "AdaptiveSparkPlan"),
    ],
    "page_keyset": [("keyset pushdown", "GreaterThan(c_custkey,200)")],
    "join_nonequi_band": [
        ("broadcast nested loop", "BroadcastNestedLoopJoin")
    ],
    # the neighbor!=query condition is non-equi → broadcast nested loop
    # over the (tiny) query side; the vector table still never shuffles
    "sim_knn_bruteforce": [("broadcast queries", "BroadcastNestedLoopJoin")],
}


def main() -> None:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from olap_db_spark import registry
    from olap_db_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    sf = "/root/testdata/sf0.1"
    bad = 0
    for name, checks in _FLAGSHIP_CHECKS.items():
        df = qs[name].fn(spark, sf)
        plan = plan_string(df)
        for label, needle in checks:
            ok = needle in plan
            bad += 0 if ok else 1
            print(f"{name}: {label}: {'OK' if ok else 'MISSING'}")
    print("AUDIT", "PASS" if bad == 0 else f"FAIL ({bad} missing)")


if __name__ == "__main__":
    main()
