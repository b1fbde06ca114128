"""Generate a deterministic sf1-scale probe dataset (10× sf0.1) for the
scale bench, WITHOUT touching /root/testdata (read-only driver property).

Method: replicate the driver's sf0.1 tables REPL times with disjoint key
spaces — every foreign key is offset by the same replica stride as its
referenced primary key, so referential integrity, join fan-outs, value
domains (dates, statuses, segments), and per-entity densities (lines per
order, events per user) are all preserved exactly; only cardinality grows.
Documents/embeddings replicate verbatim (content-addressed dedup rates
rise with scale — the realistic direction for a crawl corpus). No RNG
anywhere: the output is a pure function of the input.

Output: .scaledata/sf1/*.parquet under the repo root (gitignored; the
committed artifact is BENCH_sf1.json, not the data).

Usage: python tools/gen_scale_probe.py [REPL]   # default 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")


def _dst(repl: int) -> Path:
    # sf0.1 × repl: repl=10 → sf1, repl=100 → sf10
    name = f"sf{repl / 10:g}"
    return Path(__file__).resolve().parents[1] / ".scaledata" / name

# table -> {column: stride_key}; each column is offset by
# i * (max(stride_key column over its HOME table) + 1) for replica i.
_HOME = {
    "c": ("customer", "c_custkey"),
    "s": ("supplier", "s_suppkey"),
    "p": ("part", "p_partkey"),
    "o": ("orders", "o_orderkey"),
    "e": ("events", "event_id"),
    "u": ("events", "user_id"),
    "d": ("documents", "doc_id"),
    "v": ("embeddings", "vec_id"),
}

_OFFSETS = {
    "customer": {"c_custkey": "c"},
    "supplier": {"s_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
    "nation": {},
    "region": {},
}


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    DST = _dst(repl)
    DST.mkdir(parents=True, exist_ok=True)

    strides: dict[str, int] = {}
    for key, (table, col) in _HOME.items():
        t = pq.read_table(SRC / f"{table}.parquet", columns=[col])
        strides[key] = pc.max(t.column(col)).as_py() + 1

    for table, offs in _OFFSETS.items():
        src = pq.read_table(SRC / f"{table}.parquet")
        if not offs or repl == 1:
            reps = [src] * (1 if table in ("nation", "region") else repl)
        else:
            reps = []
            for i in range(repl):
                cols = []
                for name in src.column_names:
                    col = src.column(name)
                    if name in offs and i > 0:
                        col = pc.add(col, i * strides[offs[name]])
                    cols.append(col)
                reps.append(pa.table(dict(zip(src.column_names, cols))))
        out = pa.concat_tables(reps)
        # bounded row groups: a single big file must still yield enough
        # parquet splits to feed every core (a 500k-row documents file
        # with ~7 row groups capped map parallelism at 7/32 tasks in the
        # first sf10 probe — a layout artifact, not a plan property).
        # ~64 groups per file, floored so tiny tables stay single-group.
        pq.write_table(
            out,
            DST / f"{table}.parquet",
            row_group_size=max(8192, out.num_rows // 64),
        )
        print(f"{table}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
