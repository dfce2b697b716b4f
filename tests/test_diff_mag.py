"""Differentiable Pallas loss-magnitude kernel: forward and VJP pinned to the
XLA matmul path (same bf16 numerics), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.losses import mrstft
from svs_tpu.ops.pallas import diff_mag


@pytest.fixture(autouse=True)
def interpret_mode():
    diff_mag._INTERPRET = True
    yield
    diff_mag._INTERPRET = False


RESOLUTIONS = [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]


@pytest.mark.parametrize("n_fft,hop,win", RESOLUTIONS)
def test_forward_matches_matmul_path(rng, n_fft, hop, win):
    x = jnp.asarray((rng.standard_normal((2, 20000)) * 0.3
                     ).astype(np.float32))
    got = np.asarray(diff_mag.spectral_mag(x, n_fft, hop, win))
    want = np.asarray(mrstft._spectral_mag_matmul(x, n_fft, hop, win))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 120, 600), (512, 50, 240)])
def test_vjp_matches_matmul_path(rng, n_fft, hop, win):
    x = jnp.asarray((rng.standard_normal((1, 12000)) * 0.3
                     ).astype(np.float32))
    # weight the magnitudes so the cotangent isn't uniform
    w_key = jax.random.key(0)

    def loss_pallas(x):
        m = diff_mag.spectral_mag(x, n_fft, hop, win)
        w = jax.random.normal(w_key, m.shape)
        return jnp.sum(jnp.log(m) * w)

    def loss_matmul(x):
        m = mrstft._spectral_mag_matmul(x, n_fft, hop, win)
        w = jax.random.normal(w_key, m.shape)
        return jnp.sum(jnp.log(m) * w)

    g_pallas = np.asarray(jax.grad(loss_pallas)(x))
    g_matmul = np.asarray(jax.grad(loss_matmul)(x))
    scale = np.abs(g_matmul).max()
    np.testing.assert_allclose(g_pallas, g_matmul, atol=2e-2 * scale,
                               rtol=2e-2)


def test_loss_impl_registry(rng):
    x = jnp.asarray((rng.standard_normal((1, 20000)) * 0.2
                     ).astype(np.float32))
    y = x + 0.01
    a = float(mrstft.mr_stft_loss(x, y, impl="matmul_bf16"))
    b = float(mrstft.mr_stft_loss(x, y, impl="pallas_bf16"))
    np.testing.assert_allclose(b, a, rtol=2e-2)
