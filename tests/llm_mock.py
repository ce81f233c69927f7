"""Shared canned OpenAI-compatible chat-completions server for tests.

A real localhost HTTP server (not a monkeypatched transport) so requests
from Ray worker processes are served too.  ``reply_fn`` receives the
request's message list and returns the assistant content string.
"""

from __future__ import annotations

import contextlib
import http.server
import json
import threading


@contextlib.contextmanager
def canned_chat_server(reply_fn):
    """Yields the server's base_url (http://127.0.0.1:<port>/v1)."""

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            content = reply_fn(body["messages"])
            payload = json.dumps(
                {"choices": [{"message": {"content": content}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}/v1"
    finally:
        server.shutdown()
        server.server_close()
