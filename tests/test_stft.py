"""Parity tests for svs_tpu.ops.stft against torch.stft/istft (the CPU oracle).

The reference's DSP contract comes from librosa (data.py:79-101,159) and
torch.istft (train.py:51-58).  librosa isn't installed in this image, but for
the parameters the framework uses, librosa.stft(center=True, pad_mode
='constant') equals torch.stft(center=True, pad_mode='constant') — so torch
serves as the golden oracle for both.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svs_tpu.ops import stft as S

WIN, HOP = 1024, 768  # reference config.py:47-48


def _torch_stft(y, n_fft, hop, win_length=None, pad_mode="constant"):
    win_length = win_length or n_fft
    w = torch.hann_window(win_length)
    return torch.stft(
        torch.from_numpy(y).float(),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win_length,
        window=w,
        center=True,
        pad_mode=pad_mode,
        return_complex=True,
    ).numpy()


def test_hann_window_matches_torch():
    ours = np.asarray(S.hann_window(WIN))
    theirs = torch.hann_window(WIN).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("n", [8192, 50000, WIN])
def test_stft_matches_torch_constant_pad(rng, n):
    y = rng.standard_normal(n).astype(np.float32)
    ours = np.asarray(S.stft(jnp.asarray(y), n_fft=WIN, hop_length=HOP))
    theirs = _torch_stft(y, WIN, HOP, pad_mode="constant")
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3)
    # relative error of magnitudes is tight
    np.testing.assert_allclose(
        np.abs(ours), np.abs(theirs), atol=1e-3, rtol=1e-4
    )


def test_stft_matches_torch_reflect_pad_short_window(rng):
    """torch.stft semantics used inside the MR-STFT loss resolutions
    (auraloss at reference train.py:26): reflect pad + centred short window."""
    y = rng.standard_normal(20000).astype(np.float32)
    for n_fft, hop, win in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        ours = np.asarray(
            S.stft(jnp.asarray(y), n_fft=n_fft, hop_length=hop,
                   win_length=win, pad_mode="reflect")
        )
        theirs = _torch_stft(y, n_fft, hop, win_length=win, pad_mode="reflect")
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=3e-3)


def test_istft_matches_torch(rng):
    y = rng.standard_normal(40000).astype(np.float32)
    spec = _torch_stft(y, WIN, HOP)
    theirs = torch.istft(
        torch.from_numpy(spec),
        n_fft=WIN,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(WIN),
        return_complex=False,
    ).numpy()
    ours = np.asarray(S.istft(jnp.asarray(spec), hop_length=HOP, win_length=WIN))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_stft_istft_roundtrip(rng):
    """BASELINE.json config #1: STFT->iSTFT round-trip recovers the signal."""
    y = rng.standard_normal(30000).astype(np.float32)
    spec = S.stft(jnp.asarray(y), n_fft=WIN, hop_length=HOP)
    out = np.asarray(S.istft(spec, hop_length=HOP, win_length=WIN, length=len(y)))
    # the last  len(y) - hop*(n_frames-1)  samples fall beyond the final frame
    # start and are unrecoverable by construction (same with librosa/torch)
    covered = HOP * (spec.shape[-1] - 1)
    np.testing.assert_allclose(out[:covered], y[:covered], atol=1e-4)


def test_magphase_zero_bin_phase_is_one():
    spec = jnp.zeros((5, 4), jnp.complex64)
    mag, phase = S.magphase(spec)
    np.testing.assert_allclose(np.asarray(phase), np.ones((5, 4)), atol=0)
    np.testing.assert_allclose(np.asarray(mag), 0.0)


def test_magphase_matches_numpy(rng):
    spec = (rng.standard_normal((513, 64)) + 1j * rng.standard_normal((513, 64))
            ).astype(np.complex64)
    mag, phase = S.magphase(jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(mag), np.abs(spec), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(phase), np.exp(1j * np.angle(spec)), atol=1e-5
    )


def test_polar_matches_torch(rng):
    mag = rng.random((16, 8)).astype(np.float32)
    ang = (rng.random((16, 8)).astype(np.float32) - 0.5) * 6.0
    ours = np.asarray(S.polar(jnp.asarray(mag), jnp.asarray(ang)))
    theirs = torch.polar(torch.from_numpy(mag), torch.from_numpy(ang)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_batched_stft_istft(rng):
    yb = rng.standard_normal((3, 20000)).astype(np.float32)
    spec = S.stft(jnp.asarray(yb), n_fft=WIN, hop_length=HOP)
    assert spec.shape[:1] == (3,)
    single = S.stft(jnp.asarray(yb[1]), n_fft=WIN, hop_length=HOP)
    np.testing.assert_allclose(np.asarray(spec[1]), np.asarray(single), atol=1e-5)
    out = S.istft(spec, hop_length=HOP, win_length=WIN)
    out1 = S.istft(single, hop_length=HOP, win_length=WIN)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out1), atol=1e-6)


def test_overlap_add_small():
    frames = jnp.asarray(np.ones((2, 4), np.float32))
    out = np.asarray(S.overlap_add(frames, hop_length=2))
    np.testing.assert_allclose(out, [1, 1, 2, 2, 1, 1])


def test_amplitude_to_db_matches_librosa_formula():
    mag = np.asarray([1.0, 0.1, 1e-7], np.float32)
    db = np.asarray(S.amplitude_to_db(jnp.asarray(mag), ref=1.0, amin=1e-5))
    np.testing.assert_allclose(db[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(db[1], -20.0, atol=1e-4)
    np.testing.assert_allclose(db[2], -80.0, atol=1e-4)  # amin floor
