"""External SQL endpoint — the reference's client/server split over Spark.

The reference serves two wire protocols: HTTP :8123 and native TCP :9000
(/root/reference/docker-compose.yml:13-15; HTTP clients at
/root/reference/drivers/aiochclient_lab.py:8-13, which issue
``GET /?query=SELECT 1`` and read TSV/JSON). Spark Connect / Thrift can't
run in this container (no grpcio / thrift client), so the engine exposes
the SAME HTTP surface the reference's own clients speak, backed by
``OlapEngine.sql``:

- ``GET /ping``                     → ``Ok.\n``   (ClickHouse liveness)
- ``GET|POST /?query=...``          → result rows, TabSeparated (default)
- ``...&default_format=JSONEachRow``→ one JSON object per row

Server model: a stdlib ThreadingHTTPServer on an ephemeral port. Spark
query execution is driver-coordinated either way — an out-of-process
client (tested via a subprocess urllib client) gets true remote SQL
access while the cluster does the work. At real scale the same handler
runs next to the driver; concurrent requests become concurrent Spark
jobs, scheduled by the existing fair scheduler.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .api import OlapEngine


def _format_rows(df, fmt: str) -> bytes:
    rows = df.collect()
    cols = df.columns
    if fmt == "JSONEachRow":
        out = "".join(
            json.dumps(dict(zip(cols, [_plain(v) for v in r])), default=str)
            + "\n"
            for r in rows
        )
    else:  # TabSeparated (ClickHouse default)
        out = "".join(
            "\t".join("\\N" if v is None else str(_plain(v)) for v in r) + "\n"
            for r in rows
        )
    return out.encode("utf-8")


def _plain(v):
    """Row cells → JSON/TSV-friendly plain values."""
    if hasattr(v, "asDict"):
        return v.asDict(recursive=True)
    return v


class HttpSqlServer:
    """ClickHouse-HTTP-shaped SQL endpoint over an :class:`OlapEngine`."""

    def __init__(self, engine: OlapEngine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 - quiet
                pass

            def _reply(self, code: int, body: bytes, ctype: str = "text/plain"):
                self.send_response(code)
                self.send_header("Content-Type", f"{ctype}; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _run(self, query: str, fmt: str):
                try:
                    df = outer.engine.sql(query)
                    self._reply(200, _format_rows(df, fmt))
                except Exception as ex:  # noqa: BLE001 - surface to client
                    self._reply(400, f"{type(ex).__name__}: {ex}\n".encode())

            def do_GET(self):  # noqa: N802
                u = urlparse(self.path)
                if u.path == "/ping":
                    self._reply(200, b"Ok.\n")
                    return
                q = parse_qs(u.query)
                query = (q.get("query") or [""])[0]
                if not query:
                    self._reply(400, b"missing query parameter\n")
                    return
                self._run(query, (q.get("default_format") or ["TabSeparated"])[0])

            def do_POST(self):  # noqa: N802
                u = urlparse(self.path)
                q = parse_qs(u.query)
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n).decode("utf-8") if n else ""
                query = (q.get("query") or [body])[0] or body
                if not query:
                    self._reply(400, b"missing query\n")
                    return
                self._run(query, (q.get("default_format") or ["TabSeparated"])[0])

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="olap-http-sql", daemon=True
        )

    def start(self) -> "HttpSqlServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=10)

    def __enter__(self) -> "HttpSqlServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
