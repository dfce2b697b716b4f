"""HTTP separation service tests: drive the real socket surface."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from svs_tpu.data import wav as wavio
from svs_tpu.models import unet
from svs_tpu.serve.server import serve
from svs_tpu.utils.config import SVSConfig


@pytest.fixture(scope="module")
def server_httpd():
    params, bn_state = unet.init(jax.random.key(0))
    httpd = serve(params, bn_state, SVSConfig(), host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd
    httpd.shutdown()
    httpd.service.shutdown()


@pytest.fixture(scope="module")
def server_url(server_httpd):
    return f"http://127.0.0.1:{server_httpd.server_address[1]}"


def _wav_bytes(y, sr):
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    wavio.write_wav(path, y, sr)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["sample_rate"] == 8192


def test_separate_roundtrip(server_url, rng, tmp_path):
    y = (rng.standard_normal(8192 * 3) * 0.1).astype(np.float32)
    req = urllib.request.Request(server_url + "/separate",
                                 data=_wav_bytes(y, 8192), method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        out = r.read()
    p = tmp_path / "out.wav"
    p.write_bytes(out)
    vocal, sr = wavio.read_wav(str(p))
    assert sr == 8192 and abs(len(vocal) - len(y)) < 2
    # the mask keeps output magnitude below input scale
    assert np.abs(vocal).max() <= np.abs(y).max() * 1.5


def test_separate_vocal_solo_0(server_url, rng, tmp_path):
    y = (rng.standard_normal(8192 * 2) * 0.1).astype(np.float32)
    req = urllib.request.Request(server_url + "/separate?vocal_solo=0",
                                 data=_wav_bytes(y, 8192), method="POST")
    with urllib.request.urlopen(req) as r:
        acc = r.read()
    req = urllib.request.Request(server_url + "/separate",
                                 data=_wav_bytes(y, 8192), method="POST")
    with urllib.request.urlopen(req) as r:
        voc = r.read()
    pa, pv = tmp_path / "a.wav", tmp_path / "v.wav"
    pa.write_bytes(acc); pv.write_bytes(voc)
    a, _ = wavio.read_wav(str(pa))
    v, _ = wavio.read_wav(str(pv))
    # complementary masks reconstruct the input UP TO the DC STFT row, which
    # reference parity zeroes in every output (inference.py:123) — so
    # compare against y with its DC row removed
    import jax.numpy as jnp
    from svs_tpu.ops import stft as dsp
    spec = dsp.stft(jnp.asarray(y), n_fft=1024, hop_length=768)
    spec = spec.at[0].set(0)
    y_nodc = np.asarray(dsp.istft(spec, hop_length=768, win_length=1024,
                                  length=len(y)))
    m = min(len(a), len(v), len(y))
    lo, hi = 1024, m - 1024
    np.testing.assert_allclose((a + v)[lo:hi], y_nodc[lo:hi], atol=5e-3)


def test_separate_resamples_other_rates(server_url, rng, tmp_path):
    y = (rng.standard_normal(44100) * 0.1).astype(np.float32)
    req = urllib.request.Request(server_url + "/separate",
                                 data=_wav_bytes(y, 44100), method="POST")
    with urllib.request.urlopen(req) as r:
        out = r.read()
    p = tmp_path / "o.wav"
    p.write_bytes(out)
    v, sr = wavio.read_wav(str(p))
    assert sr == 44100  # returned at the caller's rate


def test_bad_body_is_400(server_url):
    req = urllib.request.Request(server_url + "/separate",
                                 data=b"not a wav", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())


def test_unknown_path_404(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server_url + "/nope")
    assert e.value.code == 404


def test_separate_mode_whole(server_url, rng, tmp_path):
    y = (rng.standard_normal(8192 * 2) * 0.1).astype(np.float32)
    req = urllib.request.Request(server_url + "/separate?mode=whole",
                                 data=_wav_bytes(y, 8192), method="POST")
    with urllib.request.urlopen(req) as r:
        out = r.read()
    p = tmp_path / "w.wav"
    p.write_bytes(out)
    v, sr = wavio.read_wav(str(p))
    assert sr == 8192 and abs(len(v) - len(y)) < 2


def test_separate_bad_mode_400(server_url, rng):
    y = (rng.standard_normal(8192) * 0.1).astype(np.float32)
    req = urllib.request.Request(server_url + "/separate?mode=bogus",
                                 data=_wav_bytes(y, 8192), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_missing_content_length_411(server_url):
    req = urllib.request.Request(server_url + "/separate", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code in (411, 400)  # urllib may send CL:0 -> 400


def test_oversize_body_413(rng):
    """A dedicated server with a tiny cap rejects big bodies BEFORE reading
    them into memory."""
    params, bn_state = unet.init(jax.random.key(0))
    httpd = serve(params, bn_state, SVSConfig(), host="127.0.0.1", port=0,
                  max_body_bytes=500)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        y = (rng.standard_normal(8192) * 0.1).astype(np.float32)
        req = urllib.request.Request(url + "/separate",
                                     data=_wav_bytes(y, 8192), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 413
    finally:
        httpd.shutdown()
        httpd.service.shutdown()


def test_burst_coalesced_matches_serial(server_httpd, rng):
    """Concurrent requests are coalesced into pipelined device batches and
    return bit-identical audio to serial requests."""
    service = server_httpd.service
    songs = [(rng.standard_normal(8192 * 2) * 0.1).astype(np.float32)
             for _ in range(6)]
    serial = [service.separate(y) for y in songs]

    results = [None] * len(songs)
    errors = []

    def worker(i):
        try:
            results[i] = service.separate(songs[i])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    # occupy the device worker with song 0, then flood the queue so the
    # remaining requests are waiting together when the worker next drains
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(songs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    for got, want in zip(results, serial):
        np.testing.assert_array_equal(got, want)
    # the burst must actually have been coalesced (>1 request per drain)
    assert service.max_coalesced > 1


@pytest.fixture()
def stalled_service(monkeypatch):
    """A service whose device worker is wedged (blocks until released) —
    deterministic setup for overload/timeout behaviour."""
    from svs_tpu.serve import server as server_mod

    release = threading.Event()
    entered = threading.Event()  # the worker is INSIDE the device call

    def stalled_stream(*a, **kw):
        entered.set()
        release.wait(timeout=60)
        songs = a[2]
        return [np.zeros_like(y) for y in songs]

    monkeypatch.setattr(server_mod.separate, "separate_wav_stream",
                        stalled_stream)
    params, bn_state = unet.init(jax.random.key(0))
    service = server_mod.SeparationService(
        params, bn_state, SVSConfig(), max_queue=2, request_timeout=0.3)
    yield service, release, entered
    release.set()
    service.shutdown()


def test_overload_fast_fails_not_oom(stalled_service, rng):
    """A burst above device throughput hits the bounded queue: the first
    request occupies the worker, max_queue wait, and every further request
    raises ServiceOverloaded IMMEDIATELY (no unbounded growth, no hang)."""
    from svs_tpu.serve.server import ServiceOverloaded

    service, release, entered = stalled_service
    y = (rng.standard_normal(2048) * 0.1).astype(np.float32)

    def occupy():
        try:
            service.separate(y)
        except Exception:
            pass  # these time out by design (worker wedged)

    # The worker coalesces everything pending into ONE batch, so "1 in the
    # worker + 2 queued" is only deterministic if the first request is
    # provably inside the device call before the other two enqueue.
    first = threading.Thread(target=occupy)
    first.start()
    assert entered.wait(timeout=30)  # worker wedged with exactly request #1
    occupiers = [first] + [threading.Thread(target=occupy) for _ in range(2)]
    for t in occupiers[1:]:
        t.start()
    # the worker is blocked, so the two new requests stay queued (= max_queue)
    import time
    for _ in range(500):
        if service.pending() == 2:
            break
        time.sleep(0.02)
    assert service.pending() == 2

    t0 = time.perf_counter()
    with pytest.raises(ServiceOverloaded):
        service.separate(y)
    assert time.perf_counter() - t0 < 0.1  # fast-fail, not queue-and-wait
    assert service.requests_rejected == 1
    release.set()
    for t in occupiers:
        t.join(timeout=30)


def test_request_timeout_releases_handler(stalled_service, rng):
    """A hung device call raises ServiceTimeout at the deadline instead of
    blocking the caller forever."""
    from svs_tpu.serve.server import ServiceTimeout

    service, release, _entered = stalled_service
    y = (rng.standard_normal(2048) * 0.1).astype(np.float32)
    import time
    t0 = time.perf_counter()
    with pytest.raises(ServiceTimeout):
        service.separate(y)  # worker wedged; request_timeout=0.3
    dt = time.perf_counter() - t0
    assert 0.2 < dt < 5.0
    assert service.requests_timed_out == 1
    release.set()


def test_http_overload_503_with_retry_after(monkeypatch, rng):
    """End-to-end over the socket: overflowing the queue returns 503 with a
    Retry-After header; a timed-out request returns 504."""
    from svs_tpu.serve import server as server_mod

    release = threading.Event()
    entered = threading.Event()

    def stalled_stream(*a, **kw):
        entered.set()
        release.wait(timeout=60)
        return [np.zeros_like(y) for y in a[2]]

    monkeypatch.setattr(server_mod.separate, "separate_wav_stream",
                        stalled_stream)
    params, bn_state = unet.init(jax.random.key(0))
    httpd = server_mod.serve(params, bn_state, SVSConfig(),
                             host="127.0.0.1", port=0,
                             max_queue=1, request_timeout=1.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        y = (rng.standard_normal(2048) * 0.1).astype(np.float32)
        body = _wav_bytes(y, 8192)

        codes = []

        def post(i):
            req = urllib.request.Request(url + "/separate", data=body,
                                         method="POST")
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    codes.append((i, r.status, None))
            except urllib.error.HTTPError as e:
                codes.append((i, e.code, e.headers.get("Retry-After")))

        # enough posts to fill worker + queue(1) + overflow; pin post #0
        # inside the wedged device call before the rest arrive (the worker
        # would otherwise coalesce several posts into one batch and the
        # queue might never overflow)
        import time
        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        threads[0].start()
        assert entered.wait(timeout=30)
        for th in threads[1:]:
            th.start()
            time.sleep(0.1)  # deterministic arrival order
        for th in threads:
            th.join(timeout=60)

        got = {c for _, c, _ in codes}
        assert 503 in got  # overflow fast-failed
        assert 504 in got  # worker wedged past the 1s deadline
        retry_headers = [r for _, c, r in codes if c == 503]
        assert all(r is not None for r in retry_headers)
        # healthz reflects the rejections
        with urllib.request.urlopen(url + "/healthz") as r:
            h = json.loads(r.read())
        assert h["requests_rejected"] >= 1
    finally:
        release.set()
        httpd.shutdown()
        httpd.service.shutdown()


def test_shutdown_with_full_queue_does_not_block(stalled_service, rng):
    """shutdown() on a service whose bounded queue is FULL must return
    immediately (put_nowait sentinel, best-effort) and still stop the
    worker — the blocking put deadlocked serve_cli's ^C path before the
    round-3 review fix."""
    import time

    service, release, entered = stalled_service
    y = (rng.standard_normal(2048) * 0.1).astype(np.float32)

    # as in test_overload_fast_fails_not_oom: pin request #1 inside the
    # wedged device call first, else the coalescing drain may take two
    # requests in one batch and the queue never fills
    first = threading.Thread(target=lambda: _swallow(service, y))
    first.start()
    assert entered.wait(timeout=30)
    occupiers = [first] + [threading.Thread(target=lambda: _swallow(service, y))
                           for _ in range(2)]
    for t in occupiers[1:]:
        t.start()
    for _ in range(500):
        if service.pending() == 2:
            break
        time.sleep(0.02)
    assert service.pending() == 2  # queue is full

    t0 = time.perf_counter()
    service.shutdown()
    assert time.perf_counter() - t0 < 0.5  # no blocking put
    release.set()
    for t in occupiers:
        t.join(timeout=30)
    service._worker.join(timeout=30)
    assert not service._worker.is_alive()  # _stop flag ended the drain loop


def _swallow(service, y):
    try:
        service.separate(y)
    except Exception:
        pass  # times out / shuts down by design


def test_serve_warmup_compiles_before_bind(rng):
    """serve(warmup_secs=N) pushes a silent song through the decode path
    before binding: the server comes up already compiled and still serves
    correctly; warmup counts as one served request."""
    from svs_tpu.serve.server import serve

    params, bn_state = unet.init(jax.random.key(0))
    httpd = serve(params, bn_state, SVSConfig(), host="127.0.0.1", port=0,
                  warmup_secs=0.5)
    try:
        assert httpd.service.requests_served == 1  # the warmup pass
        y = (rng.standard_normal(4096) * 0.1).astype(np.float32)
        out = httpd.service.separate(y)
        assert out.shape == y.shape and np.isfinite(out).all()
    finally:
        httpd.service.shutdown()
        httpd.server_close()


def test_healthz_percentiles_and_queue_depth(server_httpd, server_url, rng):
    """VERDICT r4 next #8: /healthz carries queue depth, queue-wait and
    device-time percentiles (p50/p90/p99 over the last 512 requests)."""
    # ensure at least one request has flowed through this module-scoped
    # server so the windows are non-empty
    server_httpd.service.separate(
        (rng.standard_normal(4096) * 0.1).astype(np.float32))
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["draining"] is False
    assert isinstance(h["pending"], int)
    for window in ("queue_wait_secs", "device_time_secs"):
        pcts = h[window]
        assert set(pcts) == {"p50", "p90", "p99"}
        assert pcts["p50"] is not None and pcts["p50"] >= 0.0
        assert pcts["p99"] >= pcts["p50"]


def test_sigterm_under_burst_drains_or_503s_cleanly(monkeypatch, rng):
    """VERDICT r4 next #8: SIGTERM during a sustained burst — every queued
    request is SERVED (drain), every post-signal request fast-fails with
    503/connection error, and no handler thread hangs.  Exercises the real
    signal path the CLI installs (install_sigterm_drain), over the socket."""
    import os
    import signal as signal_mod
    import time

    from svs_tpu.serve import server as server_mod

    def slow_stream(params, bn_state, songs, **kw):
        time.sleep(0.1)  # sustained-load stand-in for device work
        return [np.zeros_like(y) for y in songs]

    monkeypatch.setattr(server_mod.separate, "separate_wav_stream",
                        slow_stream)
    params, bn_state = unet.init(jax.random.key(0))
    httpd = server_mod.serve(params, bn_state, SVSConfig(),
                             host="127.0.0.1", port=0, max_batch=1,
                             max_queue=64)
    prev = server_mod.install_sigterm_drain(httpd, drain_timeout=60.0)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    serve_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    serve_thread.start()
    body = _wav_bytes((rng.standard_normal(2048) * 0.1).astype(np.float32),
                      8192)

    outcomes = {}

    def post(i):
        req = urllib.request.Request(url + "/separate", data=body,
                                     headers={"Content-Type": "audio/wav"})
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                outcomes[i] = r.status
        except urllib.error.HTTPError as e:
            outcomes[i] = e.code
        except Exception as e:  # connection refused/reset after shutdown
            outcomes[i] = repr(e)

    try:
        # sustained burst: 8 requests against a 0.1 s/request worker
        pre = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in pre:
            t.start()
        # wait until the burst is genuinely in flight (some queued)
        for _ in range(500):
            if httpd.service.pending() >= 3:
                break
            time.sleep(0.01)
        assert httpd.service.pending() >= 3
        os.kill(os.getpid(), signal_mod.SIGTERM)
        # post-signal stragglers while the drain is running
        for _ in range(200):
            if httpd.service._draining:
                break
            time.sleep(0.01)
        late = [threading.Thread(target=post, args=(100 + i,))
                for i in range(3)]
        for t in late:
            t.start()
        for t in pre + late:
            t.join(timeout=90)
        assert not any(t.is_alive() for t in pre + late), "hung handler"
        # every pre-signal request was served or got a clean 503 — once the
        # drain flag is up, racing enqueues legitimately fast-fail
        assert all(outcomes[i] in (200, 503) for i in range(8)), outcomes
        assert sum(outcomes[i] == 200 for i in range(8)) >= 3, outcomes
        # post-signal requests never hang: 503 while draining, or a
        # connection error once the accept loop stopped
        for i in (100, 101, 102):
            assert outcomes[i] == 503 or isinstance(outcomes[i], str), outcomes
        # the worker exited through the drain path and the loop stopped
        for _ in range(500):
            if not serve_thread.is_alive():
                break
            time.sleep(0.02)
        assert not serve_thread.is_alive()
        assert not httpd.service._worker.is_alive()
    finally:
        signal_mod.signal(signal_mod.SIGTERM, prev)
        httpd.service.shutdown()
        httpd.server_close()
