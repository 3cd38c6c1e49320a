"""Ops HTTP endpoint (reference `runtime/web.rs:19-190`, `app.rs:416-430`
— async-h1 server with slug-dispatched pages, SURVEY.md §2.1 S11).

A stdlib ThreadingHTTPServer on the driver serving JSON: built-in routes
``/`` (app summary), ``/progress`` (per-query StreamingQueryProgress —
the reference's consumer-statistics surface, `kafka/contexts.rs:31-56`),
``/state`` (driver-local app state), plus user pages registered via
``app.page(slug, handler)`` parity.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


class OpsServer:
    def __init__(self, app: Any, host: str = "0.0.0.0", port: int = 3000) -> None:
        self.app = app
        self.routes: dict[str, Callable[[], Any]] = {
            "/": lambda: {
                "app": app.name,
                "agents": sorted(getattr(app, "_agents", {})),
                "flows": sorted(getattr(app, "_flows", {})),
                "tables": sorted(getattr(app, "_tables", {})),
                "queries_active": len(getattr(app, "_queries", [])),
            },
            "/progress": lambda: app.progress(),
            "/state": lambda: {k: repr(v) for k, v in app.state.items()},
        }
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802
                fn = outer.routes.get(self.path.rstrip("/") or "/")
                if fn is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    body = json.dumps(fn(), default=str).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as exc:  # pragma: no cover
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(str(exc).encode())

            def log_message(self, *args: Any) -> None:  # silence
                return

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_port
        self._thread: threading.Thread | None = None

    def page(self, slug: str, handler: Callable[[], Any]) -> None:
        """User route parity (`app.rs:416-430`)."""
        self.routes["/" + slug.strip("/")] = handler

    def start(self) -> "OpsServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
