"""Pallas kernel correctness (interpret mode on the CPU mesh; the same
kernels compile on real TPU — exercised by bench/verify drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.ops import stft as dsp
from svs_tpu.ops.pallas import dsp as pdsp


@pytest.mark.parametrize("n", [8192, 200_000])
def test_stft_magnitude_matches_xla(rng, n):
    y = (rng.standard_normal(n) * 0.3).astype(np.float32)
    want = np.abs(np.asarray(dsp.stft(jnp.asarray(y), n_fft=1024,
                                      hop_length=768)))
    got = np.asarray(pdsp.stft_magnitude(jnp.asarray(y), 1024, 768,
                                         interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_stft_magnitude_other_geometry(rng):
    """hop < n_fft/2 -> more than 2 chunks (K=3 here)."""
    y = (rng.standard_normal(50_000) * 0.3).astype(np.float32)
    want = np.abs(np.asarray(dsp.stft(jnp.asarray(y), n_fft=512,
                                      hop_length=200)))
    got = np.asarray(pdsp.stft_magnitude(jnp.asarray(y), 512, 200,
                                         interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_stft_magnitude_rejects_2d():
    with pytest.raises(ValueError):
        pdsp.stft_magnitude(jnp.zeros((2, 100)), interpret=True)
