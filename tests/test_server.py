"""External SQL surface: out-of-process clients query the engine over
HTTP — the reference's client/server shape (docker-compose.yml:13-15
exposes :8123; its drivers issue GET /?query=...)."""

from __future__ import annotations

import subprocess
import sys

import pytest

from olap_db_spark.api import OlapEngine
from olap_db_spark.server import HttpSqlServer

SF = "/root/testdata/sf0.001"

_CLIENT = """
import sys, urllib.request
base = sys.argv[1]
def get(path):
    return urllib.request.urlopen(base + path, timeout=60).read().decode()
print(get("/ping"), end="")
print(get("/?query=SELECT%201%20AS%20one"), end="")
print(get(
    "/?query=SELECT%20o_orderpriority%2C%20COUNT(*)%20AS%20n%20FROM%20orders"
    "%20GROUP%20BY%20o_orderpriority%20ORDER%20BY%20o_orderpriority"
    "&default_format=JSONEachRow"), end="")
"""


@pytest.fixture(scope="module")
def server(spark):
    eng = OlapEngine(SF, spark=spark)
    with HttpSqlServer(eng) as srv:
        yield srv


def test_out_of_process_client_select1_and_flagship(server):
    """A SEPARATE python process (stdlib urllib only — no Spark, no repo
    imports) runs the liveness probe, SELECT 1, and a grouped flagship
    query over the wire."""
    out = subprocess.run(
        [sys.executable, "-c", _CLIENT, f"http://{server.host}:{server.port}"],
        capture_output=True,
        text=True,
        timeout=120,
        check=True,
    ).stdout
    lines = out.splitlines()
    assert lines[0] == "Ok."
    assert lines[1] == "1"
    # 5 order priorities, JSONEachRow — one JSON object per row
    import json

    rows = [json.loads(x) for x in lines[2:]]
    assert len(rows) == 5
    assert all(set(r) == {"o_orderpriority", "n"} and r["n"] > 0 for r in rows)
    assert [r["o_orderpriority"] for r in rows] == sorted(
        r["o_orderpriority"] for r in rows
    )


def test_error_surface(server):
    import urllib.error
    import urllib.request

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            f"http://{server.host}:{server.port}/?query=SELECT%20bogus_col",
            timeout=60,
        )
    assert ei.value.code == 400


def test_post_body_query(server):
    import urllib.request

    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/",
        data=b"SELECT COUNT(*) AS n FROM nation",
        method="POST",
    )
    body = urllib.request.urlopen(req, timeout=60).read().decode()
    assert body.strip() == "25"


def test_ddl_dml_over_the_wire(server):
    """The reference's clients also CREATE and INSERT over the wire
    (ClickHouse HTTP accepts DDL/DML POSTs); the endpoint passes DDL/DML
    through the engine's SQL surface."""
    import urllib.parse
    import urllib.request

    def post(sql: str) -> str:
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/",
            data=sql.encode(),
            method="POST",
        )
        return urllib.request.urlopen(req, timeout=120).read().decode()

    post("DROP TABLE IF EXISTS wire_sink")
    post("CREATE TABLE wire_sink (k INT, v STRING) USING parquet")
    try:
        post("INSERT INTO wire_sink VALUES (1, 'a'), (2, 'b')")
        post(
            "INSERT INTO wire_sink "
            "SELECT CAST(n_nationkey AS INT), n_name FROM nation "
            "WHERE n_nationkey < 3"
        )
        q = urllib.parse.quote("SELECT COUNT(*) AS n FROM wire_sink")
        body = urllib.request.urlopen(
            f"http://{server.host}:{server.port}/?query={q}", timeout=120
        ).read().decode()
        assert body.strip() == "5"
    finally:
        post("DROP TABLE IF EXISTS wire_sink")


def test_engine_serve_helper(spark):
    """OlapEngine.serve() is the one-call switch-over surface."""
    import urllib.request

    from olap_db_spark.api import OlapEngine

    srv = OlapEngine(SF, spark=spark).serve()
    try:
        body = urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}/ping", timeout=60
        ).read()
        assert body == b"Ok.\n"
    finally:
        srv.stop()


def test_explain_and_show_over_the_wire(server):
    """EXPLAIN and SHOW TABLES work through the endpoint — the admin
    surface the reference's clients exercise (connection_test.py)."""
    import urllib.parse
    import urllib.request

    def get(sql: str) -> str:
        q = urllib.parse.quote(sql)
        return urllib.request.urlopen(
            f"http://{server.host}:{server.port}/?query={q}", timeout=120
        ).read().decode()

    plan = get("EXPLAIN SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY 1")
    assert "HashAggregate" in plan or "Aggregate" in plan
    tables = get("SHOW TABLES")
    assert "orders" in tables and "lineitem" in tables
