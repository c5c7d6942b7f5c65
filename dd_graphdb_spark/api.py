"""Thin REST surface over the view catalog / router / shell.

Demo parity with the reference's axum service (src/api_service.rs:
163-183: CRUD + analytics routes dispatching to the router and cache).
Pure stdlib (http.server) — no new dependencies; every route is a
translation to the same GraphShell / ViewCatalog / QueryRouter calls
the interactive shell uses, so the REST layer adds API surface, not
execution logic. DataFrame responses are row-capped (``row_limit``) —
the API is a control/demo plane, not a bulk-export path; bulk reads
belong on the parquet/Delta tables the views materialize to.

Routes:

    GET    /stats                      database + catalog stats
    GET    /views                      {name: view_type}
    POST   /views                      {"name": .., "sql": ..} create
    GET    /views/<name>?limit=N       materialized rows (capped)
    POST   /views/<name>/refresh       {"force": bool}? refresh
    DELETE /views/<name>               drop
    POST   /query                      {"kind": .., "target": ..?}
                                       route + execute via QueryRouter
    GET    /cache/stats                cache statistics
    POST   /cache/clear | /cache/warm  unpin / pin all views
    GET    /incremental/stats          per-view dirty/incremental state
    POST   /incremental/batch          topo-ordered refresh_all
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from dd_graphdb_spark.shell import GraphShell


def _df_rows(df, limit: int) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


class GraphApiServer:
    """Embeddable HTTP server; ``start()`` binds (port 0 = ephemeral)
    and serves from a daemon thread, ``stop()`` shuts down cleanly."""

    def __init__(self, shell: GraphShell, host: str = "127.0.0.1", port: int = 0,
                 row_limit: int = 1000, gql_engine=None, allow_mutations: bool = False):
        self.shell = shell
        self.row_limit = row_limit
        # optional library-path exposure: the SHELL keeps the reference's
        # views-only philosophy (main.rs:167-175), but a deployment may
        # opt into the GQL library surface (graph/query) over HTTP
        self.gql_engine = gql_engine
        # /gql is read-only by default: opting into the read surface must
        # NOT silently expose CREATE/DELETE/SET/MERGE to unauthenticated
        # HTTP clients; writes require this explicit second opt-in
        self.allow_mutations = allow_mutations
        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "GraphApiServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _dispatch(self, method: str, path: str, query: dict, body: dict):
        """Returns (status, payload-dict). Translation table only —
        every branch delegates to shell/catalog/router."""
        shell, catalog = self.shell, self.shell.catalog
        seg = [s for s in path.split("/") if s]

        if method == "GET" and seg == ["stats"]:
            return 200, {"stats": shell.execute("stats").data}
        if seg == ["views"]:
            if method == "GET":
                return 200, {"views": shell.execute("views").data}
            if method == "POST":
                name, sql = body.get("name"), body.get("sql")
                if not name or not sql:
                    return 400, {"error": "need name and sql"}
                res = shell.execute(f"VIEW CREATE {name} AS {sql}")
                return (201, {"created": name}) if res.ok else (400, {"error": res.message})
        if len(seg) == 2 and seg[0] == "views":
            name = seg[1]
            if method == "GET":
                res = shell.execute(f"VIEW QUERY {name}")
                if not res.ok:
                    return 404, {"error": res.message}
                raw_limit = query.get("limit", [self.row_limit])[0]
                try:
                    limit = int(raw_limit)
                except (TypeError, ValueError):
                    return 400, {"error": f"limit must be an integer, got {raw_limit!r}"}
                if limit < 0:
                    return 400, {"error": "limit must be non-negative"}
                return 200, {"view": name, "rows": _df_rows(res.data, min(limit, self.row_limit))}
            if method == "DELETE":
                res = shell.execute(f"VIEW DROP {name}")
                if not res.ok:
                    return 404, {"error": res.message}
                return 200, {"dropped": name}
        if len(seg) == 3 and seg[0] == "views" and seg[2] == "refresh" and method == "POST":
            force = " FORCE" if body.get("force") else ""
            res = shell.execute(f"VIEW REFRESH {seg[1]}{force}")
            return (200, {"refreshed": seg[1], "message": res.message}) if res.ok else (404, {"error": res.message})
        if seg == ["query"] and method == "POST":
            kind = body.get("kind")
            if not kind:
                return 400, {"error": "need kind"}
            target = f" {body['target']}" if body.get("target") else ""
            res = shell.execute(f"VIEW ROUTE {kind}{target}")
            if not res.ok:
                return 404, {"error": res.message}
            decision = res.data
            df = catalog.read(decision["view"])
            return 200, {
                "routed_to": decision["view"],
                "score": decision["score"],
                "rows": _df_rows(df, self.row_limit),
            }
        if seg == ["gql"] and method == "POST":
            if self.gql_engine is None:
                return 404, {"error": "no GQL engine attached (views-only deployment)"}
            q = body.get("query")
            if not q:
                return 400, {"error": "need query"}
            try:
                if not self.allow_mutations:
                    from dd_graphdb_spark.plans.gql import MatchStatement, parse_gql

                    stmt = parse_gql(q)
                    if not isinstance(stmt, MatchStatement):
                        return 403, {
                            "error": "mutations are disabled on this endpoint "
                            "(start GraphApiServer with allow_mutations=True)"
                        }
                df = self.gql_engine.execute(q)
            except ValueError as ex:
                return 400, {"error": str(ex)}
            return 200, {"rows": _df_rows(df, self.row_limit)}
        if seg == ["cache", "stats"] and method == "GET":
            return 200, {"cache": shell.execute("CACHE STATS").data}
        if seg == ["cache", "clear"] and method == "POST":
            return 200, {"message": shell.execute("CACHE CLEAR").message}
        if seg == ["cache", "warm"] and method == "POST":
            return 200, {"message": shell.execute("CACHE WARM").message}
        if seg == ["incremental", "stats"] and method == "GET":
            return 200, {"incremental": shell.execute("INCREMENTAL STATS").data}
        if seg == ["incremental", "batch"] and method == "POST":
            res = shell.execute("INCREMENTAL BATCH")
            return 200, {"message": res.message, "refreshed": res.data}
        return 404, {"error": f"no route {method} {path}"}

    def _handler_class(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silent test server
                pass

            def _run(self, method: str):
                parsed = urlparse(self.path)
                body = {}
                length = int(self.headers.get("Content-Length") or 0)
                if length:
                    try:
                        body = json.loads(self.rfile.read(length) or b"{}")
                    except json.JSONDecodeError:
                        self._send(400, {"error": "invalid JSON body"})
                        return
                try:
                    status, payload = outer._dispatch(
                        method, parsed.path, parse_qs(parsed.query), body
                    )
                except Exception as e:  # noqa: BLE001 — surface, don't kill the server
                    status, payload = 500, {"error": str(e)}
                self._send(status, payload)

            def _send(self, status: int, payload: dict):
                data = json.dumps(payload, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._run("GET")

            def do_POST(self):
                self._run("POST")

            def do_DELETE(self):
                self._run("DELETE")

        return Handler
