"""Events-table regeneration fuzzer: the driver has ALREADY shipped the
events `ts` column in different physical encodings across rounds (nanos
in rounds 1–2, micros since round 3 — the round-1/2 hash-red cause), so
this gate re-runs every events-only query against its oracle under THREE
ts encodings (ms / us / ns) on one hostile event stream: duplicate
(user, ts) pairs, out-of-order arrival, events exactly on window/session
boundaries, value extremes, funnel stages both complete and broken.

Spark reads through catalog.load (unit reconstruction); DuckDB reads the
parquet directly — exactly the driver's two paths.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from olap_db_spark.registry import all_queries

_OTHER = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings",
)


def _events_only_queries():
    out = []
    for name, rq in all_queries().items():
        if rq.oracle is None:
            continue
        sql = rq.oracle.lower()
        if re.search(r"\bevents\b", sql) and not any(
            re.search(rf"\b{t}\b", sql) for t in _OTHER
        ):
            out.append(name)
    return sorted(out)


def _vhash(cols, rows) -> str:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(repr(r[i]) for i in idx) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()


def _hostile_events():
    """One hostile stream, ~400 rows."""
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    types = ["view", "click", "purchase", "scroll"]
    for u in range(12):
        # complete + broken funnels, duplicates, boundary hits
        for k in range(30):
            # exact 10-minute window boundaries every 5th event;
            # out-of-order by construction (k jumps backwards at k%7==0)
            minutes = (k * 7) % 180 if k % 7 else (k * 10)
            ts = base + dt.timedelta(minutes=minutes, seconds=0 if k % 5 else 0)
            et = types[(u + k) % 4] if u % 3 else types[k % 3]
            rows.append(
                (
                    eid,
                    ts,
                    u,
                    et,
                    round((-1) ** k * (k * 3.25 + u), 2),
                    json.dumps({"k": k, "u": u, "tag": f"t{k % 3}"}),
                )
            )
            eid += 1
        # exact duplicate (user, ts, type) pair — keep-latest/dedup fodder
        rows.append((eid, base + dt.timedelta(minutes=10), u, "view", 1.5, "{}"))
        eid += 1
    return rows


@pytest.fixture(scope="module", params=["ms", "us", "ns"])
def events_dir(request, tmp_path_factory):
    unit = request.param
    d = tmp_path_factory.mktemp(f"events_{unit}")
    rows = _hostile_events()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp(unit)),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return unit, str(d)


def test_events_queries_survive_unit_and_hostile_stream(spark, events_dir):
    unit, d = events_dir
    qs = all_queries()
    names = _events_only_queries()
    assert len(names) >= 15, names
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    failures = []
    for name in names:
        try:
            sdf = qs[name].fn(spark, d)
            srows = [tuple(r) for r in sdf.collect()]
            tbl = con.sql(qs[name].oracle).arrow()
            ocols = tbl.column_names
            orows = [tuple(rec[c] for c in ocols) for rec in tbl.to_pylist()]
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"CRASH {type(ex).__name__}: {str(ex)[:160]}"))
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows {len(srows)} != {len(orows)}"))
        elif _vhash(sdf.columns, srows) != _vhash(ocols, orows):
            failures.append(
                (name, f"hash; spark={sorted(srows)[:2]} duck={sorted(orows)[:2]}")
            )
    con.close()
    assert not failures, f"[unit={unit}]\n" + "\n".join(
        f"{n}: {m}" for n, m in failures
    )
