"""Minimal HTTP serving daemon for StableHLO artifacts.

The reference has no serving surface at all (SURVEY.md §1); the TPU
build's artifacts (core/serving.py) already make deployment "copy a
directory, call :func:`load_artifact`". This module closes the last gap
for network deployments: ``tools serve ARTIFACT_DIR`` exposes a loaded
artifact over HTTP with a dependency-free protocol (stdlib
``http.server`` + ``numpy`` ``.npz`` bodies — any client that can POST
bytes can drive the model).

Protocol (all endpoints under one artifact):

  ``GET  /healthz``   -> ``{"ok": true, "kind": ...}`` once the module
                         is loaded (readiness probe).
  ``GET  /manifest``  -> the artifact's manifest.json.
  ``POST /call``      -> request body is an ``.npz`` archive whose array
                         names match the artifact kind's inputs
                         (``mfcc``+``video`` for generation,
                         ``inputs`` for classification,
                         ``acoustic``+``audio``+``video`` for embedding,
                         ``audio``+``video`` for projection/joint; an
                         optional scalar ``seed`` everywhere the module
                         samples). Response is an ``.npz`` of the
                         outputs, named as in the manifest.

Execution is serialized behind one lock — a TPU runs one program at a
time, so queueing in the server beats queueing in the runtime; batch
inside a request for throughput (docs/PERF.md batching guidance).

Client example::

    import io, urllib.request, numpy as np
    buf = io.BytesIO()
    np.savez(buf, mfcc=mfcc, video=video, seed=np.int32(7))
    req = urllib.request.Request(
        "http://127.0.0.1:8321/call", data=buf.getvalue(), method="POST")
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
    generated = out["generated"]
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _call_model(model, arrays: dict) -> dict:
    """Dispatch an npz request onto the loaded ServingModel by kind."""
    kind = model.kind
    seed = int(arrays.get("seed", 0))
    if kind == "generation":
        out = model.generate(arrays["mfcc"], arrays["video"], seed=seed)
        if model.manifest.get("energy"):
            gen, energy = out
            return {"generated": gen, "energy": energy}
        return {"generated": out}
    if kind == "classification":
        return {"clip_logits": model.classify(arrays["inputs"])}
    if kind == "embedding":
        z = model.embed(
            arrays["acoustic"], arrays["audio"], arrays["video"], seed=seed
        )
        return {f"z_{k}": v for k, v in z.items()}
    # projection / joint share project()
    return {"generated": model.project(arrays["audio"], arrays["video"], seed=seed)}


class ArtifactServer:
    """HTTP server around one loaded serving artifact.

    ``port=0`` binds an ephemeral port (read it back from ``.port`` —
    how the tests run hermetically). ``serve_forever`` blocks;
    ``start()``/``shutdown()`` run it on a daemon thread."""

    def __init__(
        self,
        art_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_body_bytes: int = 1 << 30,
    ):
        from acoustic_image_generation_tpu.core.serving import load_artifact

        self.model = load_artifact(art_dir)
        self._lock = threading.Lock()
        self.max_body_bytes = int(max_body_bytes)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    body = json.dumps(
                        {"ok": True, "kind": server.model.kind}
                    ).encode()
                    return self._send(200, body, "application/json")
                if self.path == "/manifest":
                    body = json.dumps(server.model.manifest).encode()
                    return self._send(200, body, "application/json")
                return self._send(404, b"not found", "text/plain")

            def do_POST(self):
                if self.path != "/call":
                    return self._send(404, b"not found", "text/plain")
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                except ValueError:
                    return self._send(
                        400, b'{"error": "bad Content-Length"}',
                        "application/json",
                    )
                if n > server.max_body_bytes:
                    body = json.dumps(
                        {"error": f"body {n} exceeds {server.max_body_bytes}"}
                    ).encode()
                    return self._send(413, body, "application/json")
                try:
                    with np.load(io.BytesIO(self.rfile.read(n))) as npz:
                        arrays = {k: npz[k] for k in npz.files}
                    with server._lock:
                        outputs = _call_model(server.model, arrays)
                # broad on purpose: empty bodies raise EOFError, corrupt
                # npz zipfile.BadZipFile, vector seeds TypeError, missing
                # arrays KeyError, shape/kind violations ValueError — a
                # bad request must get a 400, never a dropped socket
                except Exception as e:  # noqa: BLE001
                    body = json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}
                    ).encode()
                    return self._send(400, body, "application/json")
                buf = io.BytesIO()
                np.savez(buf, **outputs)
                return self._send(
                    200, buf.getvalue(), "application/octet-stream"
                )

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
