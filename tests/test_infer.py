"""Inference tests (BASELINE.json config #3): batched whole-song decode must
equal the reference's batch-1 sliding-window semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from svs_tpu.infer import separate
from svs_tpu.models import unet
from svs_tpu.ops import stft as dsp
from svs_tpu.utils.config import SVSConfig


def _params():
    return unet.init(jax.random.key(0))


def _reference_loop(params, bn_state, mag, vocal_solo=True, seg_len=128):
    """In-test oracle reproducing reference inference.py:65-123: per-segment
    batch-1 forward, pad tail, mask multiply, unpad, concat, DC re-add."""
    mix_crop = mag[1:]
    chunks = []
    n_seg = mix_crop.shape[1] // seg_len + 1
    for i in range(n_seg):
        seg = mix_crop[:, i * seg_len:(i + 1) * seg_len]
        cur = seg.shape[1]
        if cur == 0:
            continue
        seg_in = np.pad(seg, ((0, 0), (0, seg_len - cur))) if cur < seg_len else seg
        msk, _ = unet.apply(params, bn_state, jnp.asarray(seg_in[None]),
                            train=False)
        msk = np.asarray(msk)[0]
        if not vocal_solo:
            msk = 1 - msk
        pred = seg_in * msk
        chunks.append(pred[:, :cur])
    full = np.concatenate(chunks, axis=1)
    return np.vstack([np.zeros((1, full.shape[1]), np.float32), full])


def test_batched_equals_reference_loop(rng):
    params, bn_state = _params()
    for t in (300, 128, 50):  # tail-pad, exact, shorter-than-one-segment
        mag = rng.random((513, t)).astype(np.float32)
        theirs = _reference_loop(params, bn_state, mag)
        ours = separate.separate_magnitude(params, bn_state, mag)
        assert ours.shape == theirs.shape == (513, t)
        np.testing.assert_allclose(ours, theirs, atol=2e-5)
        assert (ours[0] == 0).all()  # DC row re-added as zeros


def test_vocal_solo_flip(rng):
    params, bn_state = _params()
    mag = rng.random((513, 256)).astype(np.float32)
    v = separate.separate_magnitude(params, bn_state, mag, vocal_solo=True)
    a = separate.separate_magnitude(params, bn_state, mag, vocal_solo=False)
    # mask + (1-mask) multiply reconstructs the input on non-DC rows
    np.testing.assert_allclose(v[1:] + a[1:], mag[1:], atol=1e-5)


def test_separate_wav_roundtrip(rng):
    """vocal + accompaniment must reconstruct the mixture (masks are
    complementary and the iSTFT is linear)."""
    params, bn_state = _params()
    cfg = SVSConfig()
    y = (rng.standard_normal(8192 * 5) * 0.1).astype(np.float32)
    vocal, accomp = separate.separate_wav(params, bn_state, y, both=True,
                                          cfg=cfg)
    assert vocal.shape == accomp.shape == y.shape
    recon = vocal + accomp
    t = 1 + len(y) // cfg.hop_size
    covered = cfg.hop_size * (t - 1) - cfg.window_size  # interior
    np.testing.assert_allclose(recon[cfg.window_size:covered],
                               y[cfg.window_size:covered], atol=1e-3)


def test_separate_wav_matches_spec_path(rng):
    """The fused wav->wav graph must agree with the file-mediated path
    (stft -> normalise -> separate_magnitude -> istft with mixture phase)."""
    params, bn_state = _params()
    cfg = SVSConfig()
    y = (rng.standard_normal(8192 * 4) * 0.1).astype(np.float32)

    vocal_fused = separate.separate_wav(params, bn_state, y, cfg=cfg)

    spec = np.asarray(dsp.stft(jnp.asarray(y), n_fft=1024, hop_length=768))
    mag, phase = np.abs(spec), np.exp(1j * np.angle(spec))
    norm = mag.max()
    masked = separate.separate_magnitude(params, bn_state,
                                         (mag / norm).astype(np.float32),
                                         cfg=cfg)
    vocal_file = np.asarray(dsp.istft(jnp.asarray(masked * norm * phase),
                                      hop_length=768, win_length=1024,
                                      length=len(y)))
    # the file path zero-pads past hop*(T-1); the fused path reconstructs
    # real audio there (it sees the whole padded signal) — compare the
    # region both cover
    covered = 768 * (mag.shape[1] - 1)
    np.testing.assert_allclose(vocal_fused[:covered], vocal_file[:covered],
                               atol=2e-3)


def test_whole_mode(rng):
    """mode='whole' runs the song as one patch; agrees with the time-sharded
    halo path (which is provably equal to the unsharded whole forward)."""
    params, bn_state = _params()
    mag = rng.random((513, 700)).astype(np.float32)
    out = separate.separate_magnitude(params, bn_state, mag, mode="whole")
    assert out.shape == (513, 700)
    assert (out[0] == 0).all()
    acc = separate.separate_magnitude(params, bn_state, mag, mode="whole",
                                      vocal_solo=False)
    np.testing.assert_allclose(out[1:] + acc[1:], mag[1:], atol=1e-5)

    from svs_tpu.parallel import halo, mesh as mesh_lib
    mesh = mesh_lib.make_mesh()
    sharded = halo.separate_magnitude_time_sharded(
        params, bn_state, mag, mesh)
    # whole-mode pads to 512-frame granules, halo path to 64*n granules —
    # tail padding differs, so compare the frames fully inside both
    np.testing.assert_allclose(out[:, :512], sharded[:, :512], atol=3e-5)


def test_overlap_mode(rng):
    """50%-overlap crossfade: complementary masks still reconstruct, the
    crossfade weights sum to exactly 1, and where all windows agree (a
    constant-input region) the blended mask equals the segment mask."""
    params, bn_state = _params()
    mag = rng.random((513, 700)).astype(np.float32)
    v = separate.separate_magnitude(params, bn_state, mag, mode="overlap")
    assert v.shape == (513, 700) and (v[0] == 0).all()
    a = separate.separate_magnitude(params, bn_state, mag, mode="overlap",
                                    vocal_solo=False)
    # weights summing to 1 makes the complement property exact
    np.testing.assert_allclose(v[1:] + a[1:], mag[1:], atol=1e-5)
    assert (v[1:] <= mag[1:] + 1e-5).all()  # blended mask stays in [0,1]
