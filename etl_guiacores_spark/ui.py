"""Zero-dependency progress UI for pipeline runs.

The reference ships a Streamlit panel whose functional content is a
live per-stage progress display over the running extraction
(reference: streamlit_app.py:66-81). This engine already exposes that
content as a ``progress_callback(stage, info)`` hook on every
pipeline/discovery entry point; this module serves it over HTTP with
nothing but the standard library (streamlit is not a dependency of a
Spark engine, and isn't in the runtime image):

- ``ProgressBoard`` — a thread-safe event store whose ``callback``
  method plugs directly into any ``progress_callback=`` parameter.
- ``start_server(board)`` — a daemon ``ThreadingHTTPServer`` serving
  ``/`` (self-refreshing HTML stage table) and ``/events.json`` (the
  raw event list for programmatic consumers).

Driver-side only: the server runs next to the SparkSession and
observes callback events; it never touches executors or adds Spark
jobs (the counts it shows are the ones the pipeline already computes
via ``observe``).
"""

from __future__ import annotations

import html
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class ProgressBoard:
    """Thread-safe store of (stage, info) progress events."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._events: list[dict] = []
        self._t0 = time.time()

    def callback(self, stage: str, info: dict) -> None:
        """Plugs into ``progress_callback=`` on pipeline/discovery."""
        event = dict(info or {})
        # the board's own fields win: an info dict carrying a 'stage'
        # key must not mask the positional stage (or the 'done'
        # sentinel the renderer keys on)
        event["stage"] = stage
        event["elapsed_s"] = round(time.time() - self._t0, 2)
        with self._lock:
            self._events.append(event)

    def events(self) -> list[dict]:
        with self._lock:
            return [dict(e) for e in self._events]


def _render_html(events: list[dict]) -> str:
    cols: list[str] = []
    for e in events:
        for k in e:
            if k not in cols:
                cols.append(k)
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    rows = "".join(
        "<tr>"
        + "".join(f"<td>{html.escape(str(e.get(c, '')))}</td>" for c in cols)
        + "</tr>"
        for e in events
    )
    done = any(e.get("stage") == "done" for e in events)
    status = "finished" if done else "running…"
    refresh = "" if done else '<meta http-equiv="refresh" content="2">'
    return (
        "<!DOCTYPE html><html><head><title>pipeline progress</title>"
        f"{refresh}<style>body{{font-family:monospace;margin:2em}}"
        "table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:4px 10px;text-align:left}</style></head><body>"
        f"<h3>pipeline progress — {status}</h3>"
        f"<table><tr>{head}</tr>{rows}</table>"
        '<p><a href="/events.json">events.json</a></p></body></html>'
    )


def start_server(
    board: ProgressBoard, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Serve ``board`` on a daemon thread; returns the server (its
    bound port is ``server.server_address[1]``; ``port=0`` picks a
    free one). Call ``.shutdown()`` then ``.server_close()`` when the
    run is over (shutdown stops the loop, server_close releases the
    bound socket) — or don't: the thread is a daemon and dies with
    the process."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/events.json":
                body = json.dumps(board.events(), default=str).encode()
                ctype = "application/json"
            elif self.path in ("/", "/index.html"):
                body = _render_html(board.events()).encode()
                ctype = "text/html; charset=utf-8"
            else:  # /favicon.ico, typos: a real 404, not 200-with-HTML
                body = b"not found\n"
                self.send_response(404)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args) -> None:  # quiet: progress is the UI
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
