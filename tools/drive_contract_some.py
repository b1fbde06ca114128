"""Targeted driver simulation: oracle-hash a NAMED subset of declared
queries at sf0.01, with drive_contract.py's exact fetch/hash protocol
(arrow fetch — HUGEINT-safe). Usage:

    python tools/drive_contract_some.py name [name ...]
"""
import sys, hashlib
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
from pyspark.sql import SparkSession
import duckdb

names = sys.argv[1:]
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("driver-sim-some").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

qs, oracles = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

def vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(repr(tuple(r[i] for i in order)) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

failures = []
for name in names:
    fn = qs[name]
    try:
        sdf = fn(spark, "/root/testdata/sf0.01")
        srows = [tuple(r) for r in sdf.collect()]
        tbl = con.sql(oracles[name]).arrow()
        dcols = tbl.column_names
        drows = [tuple(d[c] for c in dcols) for d in tbl.to_pylist()]
        ok = (len(srows) == len(drows)) and vhash(sdf.columns, srows) == vhash(dcols, drows)
        print(f"{name}: spark_rows={len(srows)} duck_rows={len(drows)} hash_match={ok}")
        if not ok:
            failures.append(name)
    except Exception as ex:
        failures.append(name)
        print(f"{name}: CRASH {type(ex).__name__}: {str(ex).splitlines()[0][:140]}")
print(f"FAILURES: {failures}" if failures else "ALL OK")
spark.stop()
