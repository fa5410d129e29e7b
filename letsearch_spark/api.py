"""Serving API surface (A1-A4 in SURVEY.md §2.6).

Reference: src/serve.rs (actix-web). Online low-latency serving is out
of scope per BASELINE.json, but the API *contract* is reproduced as
plain Python functions over a collection root, each returning the
reference's response envelope ``{"data": ..., "status": ..., "time": ...}``
(serve.rs:14-46):

* :func:`healthcheck`      -- GET /                     (serve.rs:77-87)
* :func:`list_collections` -- GET /collections          (serve.rs:89-113)
* :func:`get_collection`   -- GET /collections/{name}   (serve.rs:115-146)
* :func:`search`           -- POST /collections/{name}/search
                              (serve.rs:148-183; limit 1..=100 default 10,
                              serve.rs:48-53)

An HTTP wrapper (stdlib http.server) is provided for parity demos; it
is a thin shim over these functions and not a production server.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

from letsearch_spark import __version__
from letsearch_spark.collection import Collection
from letsearch_spark.config import CollectionConfig

DEFAULT_LIMIT = 10  # serve.rs:48-53


def _envelope(data, status: int = 200, t0: float | None = None) -> dict:
    return {
        "data": data,
        "status": status,
        "time": round((time.time() - t0) * 1000, 3) if t0 else 0.0,
    }


def _collection_names(root: str) -> list[str]:
    base = os.path.join(root, "collections")
    if not os.path.isdir(base):
        return []
    return sorted(
        d
        for d in os.listdir(base)
        if os.path.exists(os.path.join(base, d, "config.json"))
    )


def healthcheck() -> dict:
    t0 = time.time()
    return _envelope({"version": __version__, "status": "ok"}, 200, t0)


def list_collections(root: str) -> dict:
    """Name + index_columns only, like the reference (serve.rs:99-107)."""
    t0 = time.time()
    out = []
    for name in _collection_names(root):
        cfg = CollectionConfig.load(os.path.join(root, "collections", name, "config.json"))
        out.append({"name": cfg.name, "index_columns": cfg.index_columns})
    return _envelope({"collections": out}, 200, t0)


def get_collection(root: str, name: str) -> dict:
    t0 = time.time()
    path = os.path.join(root, "collections", name, "config.json")
    if not os.path.exists(path):
        return _envelope({"error": f"collection {name!r} not found"}, 404, t0)
    return _envelope(asdict(CollectionConfig.load(path)), 200, t0)


def search(
    spark,
    root: str,
    name: str,
    column_name: str,
    query: str,
    limit: int = DEFAULT_LIMIT,
) -> dict:
    """POST /collections/{name}/search semantics incl. error mapping:
    unknown collection/column -> 404, bad limit -> 400 (serve.rs:148-183)."""
    t0 = time.time()
    if not isinstance(limit, int) or not 1 <= limit <= 100:
        return _envelope({"error": f"limit must be in [1, 100], got {limit}"}, 400, t0)
    try:
        coll = Collection.load(spark, root, name)
    except FileNotFoundError:
        return _envelope({"error": f"collection {name!r} not found"}, 404, t0)
    if column_name not in coll.config.index_columns:
        return _envelope(
            {"error": f"column {column_name!r} is not indexed"}, 404, t0
        )
    try:
        # strategy='local' mirrors the reference's serving model: index +
        # content held in driver RAM, zero Spark jobs per query
        # (collection_actor.rs:143-152 keeps usearch + DuckDB open in-process)
        results = coll.search_rows(column_name, query, limit=limit)
    except Exception as e:  # -> 500 envelope (serve.rs:176-182)
        return _envelope({"error": str(e)}, 500, t0)
    return _envelope({"results": results}, 200, t0)


def make_http_server(spark, root: str, port: int = 7898):
    """Thin stdlib HTTP shim over the functions above (demo/testing only)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(payload.get("status", 200))
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/":
                return self._send(healthcheck())
            if self.path == "/collections":
                return self._send(list_collections(root))
            if self.path.startswith("/collections/"):
                return self._send(get_collection(root, self.path.split("/")[2]))
            return self._send(_envelope({"error": "not found"}, 404))

        def do_POST(self):
            parts = self.path.split("/")
            if len(parts) == 4 and parts[1] == "collections" and parts[3] == "search":
                n = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._send(_envelope({"error": "invalid JSON"}, 400))
                return self._send(
                    search(
                        spark,
                        root,
                        parts[2],
                        body.get("column_name", "text"),
                        body.get("query", ""),
                        body.get("limit", DEFAULT_LIMIT),
                    )
                )
            return self._send(_envelope({"error": "not found"}, 404))

    return HTTPServer(("127.0.0.1", port), Handler)
