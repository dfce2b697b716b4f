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

API-change note (since round 2): the default ``mode`` for POST /separate is
``overlap`` (crossfaded half-overlapping windows, ~0.12 dB better SDR), NOT
the reference-parity ``segments`` — clients that omit ``?mode=`` get overlap
output.  Pass ``?mode=segments`` explicitly for reference-identical decoding;
``/healthz`` reports the effective ``default_mode`` so deployments can verify
which contract they are running.
"""

from __future__ import annotations

import collections
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from svs_tpu.data import wav as wavio
from svs_tpu.infer import separate
from svs_tpu.utils.config import SVSConfig


class ServiceOverloaded(RuntimeError):
    """The request queue is full — the caller should retry later (HTTP 503)."""


class ServiceDraining(RuntimeError):
    """The service is draining for shutdown — no new work is admitted
    (HTTP 503, no Retry-After: the process is going away)."""


def _percentiles(samples, qs=(50, 90, 99)):
    """{p50: ..., p90: ..., p99: ...} over a sample window (None if empty).
    Nearest-rank on a sorted copy — 512 floats, no numpy needed."""
    if not samples:
        return {f"p{q}": None for q in qs}
    s = sorted(samples)
    return {f"p{q}": round(s[min(len(s) - 1, int(q / 100.0 * len(s)))], 4)
            for q in qs}


class ServiceTimeout(RuntimeError):
    """No result within the per-request deadline — e.g. a wedged device call
    (HTTP 504).  The handler thread is released instead of blocking forever."""


class SeparationService:
    """Owns the model and the single device-worker thread.

    Queued requests are COALESCED: each drain pass pulls everything waiting
    (up to ``max_batch``), groups it by (vocal_solo, mode), and pushes each
    group through the pipelined streaming path in one go — request i+1's
    host->device transfer overlaps request i's compute and copy-back, so a
    burst of N requests costs ~max(H2D, compute, D2H) each instead of their
    sum (BASELINE config: multi-song batched streaming).

    Admission control: the queue is BOUNDED (``max_queue`` pending requests,
    each up to a full song in memory) — a sustained burst above device
    throughput fast-fails with :class:`ServiceOverloaded` instead of growing
    the queue until OOM; and every request carries a deadline
    (``request_timeout`` seconds) so a hung device call raises
    :class:`ServiceTimeout` in the waiting thread instead of wedging every
    handler forever."""

    def __init__(self, params, bn_state, cfg: Optional[SVSConfig] = None,
                 max_batch: int = 8, max_queue: int = 32,
                 request_timeout: float = 300.0):
        self.params = params
        self.bn_state = bn_state
        self.cfg = cfg or SVSConfig()
        self.max_batch = max_batch
        self.max_queue = max_queue
        self.request_timeout = request_timeout
        self._q: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()
        self.requests_served = 0
        self.requests_rejected = 0
        self.requests_timed_out = 0
        self.batches_run = 0
        self.max_coalesced = 0
        self._draining = False
        # observability windows (last 512 requests): seconds a request sat
        # queued before its drain pass picked it up, and seconds of device
        # work attributed to it (its batch's stream-call wall / group size)
        self.queue_wait_window: collections.deque = collections.deque(
            maxlen=512)
        self.device_time_window: collections.deque = collections.deque(
            maxlen=512)

    def _drain(self):
        while True:
            item = self._q.get()
            if item is None or self._stop.is_set():
                return
            items = [item]
            while len(items) < self.max_batch:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:  # keep the shutdown signal
                    try:
                        self._q.put_nowait(None)
                    except queue.Full:
                        # racing clients refilled the queue; the _stop flag
                        # (set before the sentinel) still ends the loop at
                        # the next get()
                        pass
                    break
                items.append(nxt)

            now = time.perf_counter()
            for it in items:
                self.queue_wait_window.append(now - it[4])

            # group by device-call signature, preserving arrival order
            groups: dict = {}
            for it in items:
                groups.setdefault((it[1], it[2]), []).append(it)
            for (vocal_solo, mode), grp in groups.items():
                t0 = time.perf_counter()
                try:
                    outs = separate.separate_wav_stream(
                        self.params, self.bn_state, [it[0] for it in grp],
                        vocal_solo=vocal_solo, cfg=self.cfg, mode=mode)
                    for it, out in zip(grp, outs):
                        it[3].put(("ok", out))
                except Exception as e:  # propagate to the request threads
                    for it in grp:
                        it[3].put(("error", str(e)))
                per_req = (time.perf_counter() - t0) / len(grp)
                self.device_time_window.extend([per_req] * len(grp))
            self.batches_run += 1
            self.max_coalesced = max(self.max_coalesced, len(items))

    def separate(self, y: np.ndarray, vocal_solo: bool = True,
                 mode: str = "segments",
                 timeout: Optional[float] = None) -> np.ndarray:
        if self._draining:
            self.requests_rejected += 1
            raise ServiceDraining("service is draining; not admitting work")
        done: queue.Queue = queue.Queue(1)
        try:
            self._q.put_nowait((y, vocal_solo, mode, done,
                                time.perf_counter()))
        except queue.Full:
            self.requests_rejected += 1
            raise ServiceOverloaded(
                f"request queue full ({self.max_queue} pending)")
        try:
            status, payload = done.get(
                timeout=self.request_timeout if timeout is None else timeout)
        except queue.Empty:
            # the worker may still deliver later; its put() into the
            # abandoned size-1 `done` queue succeeds and is simply dropped
            self.requests_timed_out += 1
            raise ServiceTimeout(
                f"no result within {timeout or self.request_timeout:.0f}s")
        if status != "ok":
            raise RuntimeError(payload)
        self.requests_served += 1
        return payload

    def pending(self) -> int:
        return self._q.qsize()

    def stats(self) -> dict:
        """Observability snapshot for /healthz: counters, queue depth, and
        queue-wait / device-time percentiles over the last 512 requests."""
        return {
            "requests_served": self.requests_served,
            "requests_rejected": self.requests_rejected,
            "requests_timed_out": self.requests_timed_out,
            "pending": self.pending(),
            "batches_run": self.batches_run,
            "max_coalesced": self.max_coalesced,
            "draining": self._draining,
            "queue_wait_secs": _percentiles(list(self.queue_wait_window)),
            "device_time_secs": _percentiles(list(self.device_time_window)),
        }

    def drain(self, timeout: float = 60.0) -> bool:
        """Graceful shutdown: stop admitting (new requests fast-fail with
        :class:`ServiceDraining` -> 503), FINISH everything already queued
        (their handler threads get real responses), then stop the worker.
        Returns True when the worker exited within ``timeout`` — False means
        queued work is still running (a hung device call); the caller may
        fall back to :meth:`shutdown`.  Idempotent with shutdown(): _stop is
        only set after the queue empties, so items ahead of the sentinel
        are served, FIFO."""
        self._draining = True
        try:
            self._q.put(None, timeout=timeout)  # FIFO: behind queued work
        except queue.Full:
            return False
        self._worker.join(timeout=timeout)
        alive = self._worker.is_alive()
        self._stop.set()
        return not alive

    def shutdown(self):
        self._stop.set()
        try:
            # non-blocking: a full queue (bounded since the admission-control
            # change) must not deadlock shutdown — the _drain loop checks
            # _stop on every get, so the sentinel is best-effort only
            self._q.put_nowait(None)
        except queue.Full:
            pass


# default decode mode for POST /separate when ?mode= is omitted: 'overlap'
# (crossfaded half-overlapping patches) measures ~0.12 dB better SDR than the
# reference's seam-prone disjoint segments at equal device cost
# (docs/ROUND_NOTES round 1); the batch CLI (svs-inference) keeps 'segments'
# for reference output parity — a server has no reference counterpart to
# match.  See the module docstring's API-change note.
DEFAULT_MODE = "overlap"

# request bodies above this are rejected with 413 (a 10-minute stereo
# float32 WAV at 44.1 kHz is ~211 MB; the cap is a DoS guard, not a format
# limit — raise via serve(max_body_bytes=...))
DEFAULT_MAX_BODY = 256 << 20


def make_handler(service: SeparationService,
                 max_body_bytes: int = DEFAULT_MAX_BODY):
    cfg = service.cfg

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj, headers=()):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {"status": ("draining" if service._draining
                                            else "ok"),
                                 "sample_rate": cfg.sample_rate,
                                 "default_mode": DEFAULT_MODE,
                                 **service.stats()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/separate":
                return self._json(404, {"error": "unknown path"})
            q = parse_qs(parsed.query)
            vocal_solo = q.get("vocal_solo", ["1"])[0] != "0"
            mode = q.get("mode", [DEFAULT_MODE])[0]
            if mode not in ("segments", "whole", "overlap"):
                return self._json(400, {"error": f"unknown mode {mode!r}"})
            cl = self.headers.get("Content-Length")
            if cl is None:
                return self._json(411, {"error": "Content-Length required"})
            try:
                n = int(cl)
            except ValueError:
                return self._json(400, {"error": "bad Content-Length"})
            if n <= 0:
                return self._json(400, {"error": "empty body"})
            if n > max_body_bytes:
                return self._json(
                    413, {"error": f"body of {n} bytes exceeds the "
                                   f"{max_body_bytes}-byte limit"})
            try:
                raw = self.rfile.read(n)
                y, sr = wavio.parse_wav(raw, name="<request body>")
                y = wavio.to_mono(y)
                if sr != cfg.sample_rate:
                    y = wavio.resample(y, sr, cfg.sample_rate)
                out = service.separate(y.astype(np.float32), vocal_solo,
                                       mode)
                if sr != cfg.sample_rate:
                    out = wavio.resample(out, cfg.sample_rate, sr)
                body = wavio.encode_wav(out, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except ServiceDraining as e:
                self._json(503, {"error": str(e)})
            except ServiceOverloaded as e:
                # back off roughly one drain's worth; the queue is bounded so
                # pending/max_batch is a sane unit of wait
                retry = max(1, service.pending() // max(service.max_batch, 1))
                self._json(503, {"error": str(e)},
                           headers=[("Retry-After", str(retry))])
            except ServiceTimeout as e:
                self._json(504, {"error": str(e)})
            except Exception as e:
                self._json(400, {"error": str(e)})

    return Handler


def install_sigterm_drain(httpd, drain_timeout: float = 60.0):
    """Make SIGTERM (the orchestrator's stop signal) drain gracefully:
    stop admitting (new requests 503 ServiceDraining), finish queued work
    so in-flight handlers get real responses, then stop the accept loop.

    The handler only spawns a helper thread: ``httpd.shutdown()`` called
    from the serve_forever thread (where Python runs signal handlers)
    would deadlock.  Returns the previous handler (tests restore it).
    Call from the main thread (CPython delivers signals there)."""
    import signal

    def _graceful():
        print("[svs-serve] SIGTERM: draining...", flush=True)
        ok = httpd.service.drain(timeout=drain_timeout)
        print(f"[svs-serve] drain {'complete' if ok else 'TIMED OUT'}; "
              "stopping", flush=True)
        httpd.shutdown()

    return signal.signal(
        signal.SIGTERM,
        lambda *_: threading.Thread(target=_graceful, daemon=True).start())


def serve(params, bn_state, cfg: Optional[SVSConfig] = None,
          host: str = "127.0.0.1", port: int = 8571,
          max_body_bytes: int = DEFAULT_MAX_BODY, max_batch: int = 8,
          max_queue: int = 32, request_timeout: float = 300.0,
          warmup_secs: float = 0.0):
    """Blocking entry: start the service (returns the server for tests).

    ``warmup_secs`` > 0: push one silent song of that length through the
    full decode path BEFORE binding the port, so the length bucket it
    falls in (and everything the buckets share) is compiled — and lands in
    the on-disk XLA cache — before the first real request arrives.  Size
    it like your typical song; 0 (default) binds immediately and the
    first request per bucket pays its compile."""
    service = SeparationService(params, bn_state, cfg, max_batch=max_batch,
                                max_queue=max_queue,
                                request_timeout=request_timeout)
    if warmup_secs > 0:
        sr = service.cfg.sample_rate
        silent = np.zeros(max(1, int(sr * warmup_secs)), np.float32)
        service.separate(silent, mode=DEFAULT_MODE,
                         timeout=max(request_timeout, 1800.0))
        print(f"[svs-serve] warmup done ({warmup_secs:g}s bucket compiled)")
    httpd = ThreadingHTTPServer((host, port),
                                make_handler(service, max_body_bytes))
    httpd.service = service  # type: ignore[attr-defined]
    return httpd
