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
