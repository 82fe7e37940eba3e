"""HTTP query service — the Spark-first analog of the reference's
web-service entry point.

The reference wraps its engine as a long-running HTTP service
(/root/reference/src/ast/analyzing/netplex.ml:93-177 routes requests to
worker processes; diffast_ws.ml:541-545 dispatches the comparison
behind a web endpoint). Here the same idea is one long-lived
SparkSession serving the ENTIRE oracle-checked query battery
(``__spark_entry__.queries()``) over plain HTTP:

- ``GET /health``            → liveness + Spark version
- ``GET /queries``           → the available query names
- ``GET /query/<name>``      → run it; params ``sf_dir`` (default the
  driver's sf0.01) and ``limit`` (row cap, default 1000)

Design notes, Spark-first:

- ONE shared SparkSession. Spark schedules concurrent actions from
  multiple threads fine (FAIR/FIFO pools), but this service serializes
  requests with a lock anyway: the battery's queries are sub-second at
  service scale, and a single local JVM gains nothing from interleaving
  two full-corpus jobs — a real deployment swaps the lock for a
  scheduler pool per request class, same code shape.
- The row cap is applied with ``.limit(n)`` BEFORE ``collect`` — the cap
  reaches the plan (CollectLimit), so a giant result never materializes
  on the driver; it is not a post-hoc slice.
- Responses are JSON with stringified values (timestamps, decimals, and
  bytes stay round-trippable without a custom encoder); the schema rides
  alongside so a client can re-type.

stdlib-only (http.server) — no web framework in this environment.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

DEFAULT_SF_DIR = "/root/testdata/sf0.01"
DEFAULT_LIMIT = 1000
MAX_LIMIT = 100_000
# sf_dir values must resolve under one of these roots (ADVICE r05): the
# parameter reaches spark.read.parquet, and an unvalidated path would let
# any local file readable by the process be served over HTTP. Non-loopback
# binds remain unsupported.
ALLOWED_SF_ROOTS = ("/root/testdata",)


class UnknownQuery(KeyError):
    """Name not in the registry — a KeyError raised INSIDE a query's own
    execution must not be misreported as 404 'unknown query'."""


def _json_safe(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_safe(x) for k, x in v.items()}
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


class QueryService:
    """Holds the session, the query registry, and the execution lock."""

    def __init__(self, spark, queries: dict | None = None):
        import __spark_entry__ as entry

        self.spark = spark
        self.queries = entry.queries() if queries is None else queries
        self.lock = threading.Lock()

    def run(self, name: str, sf_dir: str, limit: int) -> dict:
        fn = self.queries.get(name)
        if fn is None:
            raise UnknownQuery(name)
        import os

        real = os.path.realpath(sf_dir)
        if not any(
            real == root or real.startswith(root + os.sep)
            for root in ALLOWED_SF_ROOTS
        ):
            raise ValueError(f"sf_dir outside the allowed corpus roots: {sf_dir}")
        limit = max(1, min(limit, MAX_LIMIT))
        with self.lock:
            try:
                df = fn(self.spark, sf_dir).limit(limit)
                rows = [
                    {k: _json_safe(v) for k, v in r.asDict(recursive=True).items()}
                    for r in df.collect()
                ]
                schema = [
                    {"name": f.name, "type": f.dataType.simpleString()}
                    for f in df.schema.fields
                ]
            finally:
                # operators that persist() intermediates (tfidf's tf table,
                # the dedup shingle streams) hold STRONG CacheManager refs
                # GC never frees; in this long-lived session each distinct
                # sf_dir would otherwise pin a corpus-sized disk cache for
                # the service lifetime (ADVICE r05)
                self.spark.catalog.clearCache()
        return {"query": name, "sf_dir": sf_dir, "n_rows": len(rows),
                "limit": limit, "schema": schema, "rows": rows}


def _make_handler(svc: QueryService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: the service logs via responses
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            u = urlparse(self.path)
            try:
                if u.path == "/health":
                    self._send(200, {"ok": True, "spark": svc.spark.version})
                elif u.path == "/queries":
                    self._send(200, {"queries": sorted(svc.queries)})
                elif u.path.startswith("/query/"):
                    name = u.path[len("/query/"):]
                    q = parse_qs(u.query)
                    sf_dir = q.get("sf_dir", [DEFAULT_SF_DIR])[0]
                    raw_limit = q.get("limit", [str(DEFAULT_LIMIT)])[0]
                    try:
                        limit = int(raw_limit)
                    except ValueError:
                        self._send(
                            400, {"error": f"limit must be an int: {raw_limit!r}"}
                        )
                        return
                    self._send(200, svc.run(name, sf_dir, limit))
                else:
                    self._send(404, {"error": f"no route {u.path}"})
            except UnknownQuery as e:
                self._send(404, {"error": f"unknown query {e}"})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # surface, don't kill the server
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(spark, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Start the service on (host, port); port 0 picks an ephemeral port
    (read it back from ``server.server_address``). Runs the accept loop
    in a daemon thread and returns the server for shutdown()."""
    server = ThreadingHTTPServer((host, port), _make_handler(QueryService(spark)))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
