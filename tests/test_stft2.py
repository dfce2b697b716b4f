"""Additional DSP boundary tests."""

import numpy as np

import jax.numpy as jnp

from svs_tpu.ops import stft as S


def test_istft_ri_jit_roundtrip(rng):
    """The f32 real/imag-boundary iSTFT equals the complex-input iSTFT."""
    y = rng.standard_normal(20000).astype(np.float32)
    spec = np.asarray(S.stft(jnp.asarray(y), n_fft=1024, hop_length=768))
    want = np.asarray(S.istft(jnp.asarray(spec), hop_length=768,
                              win_length=1024))
    ri = np.stack([spec.real, spec.imag]).astype(np.float32)
    got = np.asarray(S.istft_ri_jit(jnp.asarray(ri), n_fft=1024,
                                    hop_length=768))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_stft_magphase_jit_planes(rng):
    """Preprocessing boundary: f32 planes reassemble to the complex phase."""
    y = rng.standard_normal(30000).astype(np.float32)
    mag, ri = S.stft_magphase_jit(jnp.asarray(y), n_fft=1024, hop_length=768)
    mag, ri = np.asarray(mag), np.asarray(ri)
    spec = np.asarray(S.stft(jnp.asarray(y), n_fft=1024, hop_length=768))
    np.testing.assert_allclose(mag, np.abs(spec), atol=1e-4)
    phase = ri[0] + 1j * ri[1]
    np.testing.assert_allclose(mag * phase, spec, atol=2e-3)
    np.testing.assert_allclose(np.abs(phase), 1.0, atol=1e-5)
