"""Reduction-fused Pallas MR-STFT loss kernel: forward and VJP pinned to the
XLA matmul path (same bf16 numerics), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.losses import mrstft
from svs_tpu.ops.pallas import fused_loss


@pytest.fixture(autouse=True)
def interpret_mode():
    fused_loss._INTERPRET = True
    yield
    fused_loss._INTERPRET = False


RESOLUTIONS = [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]


@pytest.mark.parametrize("impl", ["pallas_fused", "pallas_fused_wide"])
@pytest.mark.parametrize("n_fft,hop,win", RESOLUTIONS)
def test_loss_matches_matmul_path(rng, n_fft, hop, win, impl):
    x = jnp.asarray((rng.standard_normal((2, 20000)) * 0.3
                     ).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((2, 20000)) * 0.3
                     ).astype(np.float32))
    got = float(mrstft.stft_loss(x, y, n_fft, hop, win, impl=impl))
    want = float(mrstft.stft_loss(x, y, n_fft, hop, win, impl="matmul_bf16"))
    # identical bf16-matmul numerics up to reduction order (partials are
    # masked in-kernel, so padding contributes nothing)
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("impl", ["pallas_fused", "pallas_fused_wide"])
def test_grad_matches_matmul_path(rng, impl):
    n_fft, hop, win = 1024, 120, 600
    x = jnp.asarray((rng.standard_normal((1, 12000)) * 0.3
                     ).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 12000)) * 0.3
                     ).astype(np.float32))

    gf = jax.grad(lambda x: mrstft.stft_loss(x, y, n_fft, hop, win,
                                             impl=impl))(x)
    gm = jax.grad(lambda x: mrstft.stft_loss(x, y, n_fft, hop, win,
                                             impl="matmul_bf16"))(x)
    gf, gm = np.asarray(gf), np.asarray(gm)
    scale = np.abs(gm).max()
    # two distinct bf16 rounding paths: agreement at a few bf16 eps
    assert np.abs(gf - gm).max() / scale < 2e-2
    # direction must agree strongly (cosine similarity)
    cos = (gf * gm).sum() / (np.linalg.norm(gf) * np.linalg.norm(gm))
    assert cos > 0.9999


def test_target_gets_zero_cotangent(rng):
    """y is the training target: its cotangent is exactly zero (and the
    caller additionally stop_gradients it)."""
    x = jnp.asarray((rng.standard_normal((1, 8000)) * 0.3
                     ).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 8000)) * 0.3
                     ).astype(np.float32))
    gy = jax.grad(lambda y: jnp.sum(fused_loss.loss_partials(
        x, y, 512, 50, 240)))(y)
    assert (np.asarray(gy) == 0).all()


@pytest.mark.parametrize("impl", ["pallas_fused", "pallas_fused_wide"])
def test_weighted_drops_rows_exactly(rng, impl):
    """weight [1, 0] equals the single-row batch — zero-weight padding drops
    out of all three partial sums."""
    x = jnp.asarray((rng.standard_normal((2, 16000)) * 0.3
                     ).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((2, 16000)) * 0.3
                     ).astype(np.float32))
    w = jnp.asarray([1.0, 0.0])
    a = float(mrstft.stft_loss(x, y, 1024, 120, 600, impl=impl,
                               weight=w))
    b = float(mrstft.stft_loss(x[:1], y[:1], 1024, 120, 600,
                               impl=impl))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_mr_stft_loss_with_fused_impl(rng):
    """The 3-resolution wrapper runs with impl='pallas_fused' and lands near
    the matmul-path value."""
    x = jnp.asarray((rng.standard_normal((2, 20000)) * 0.3
                     ).astype(np.float32))
    y = x * 0.8 + 0.01
    got = float(mrstft.mr_stft_loss(x, y, impl="pallas_fused"))
    want = float(mrstft.mr_stft_loss(x, y, impl="matmul_bf16"))
    np.testing.assert_allclose(got, want, rtol=5e-3)


@pytest.mark.parametrize("n_fft,hop,win", RESOLUTIONS)
def test_wide_partials_match_chunked(rng, n_fft, hop, win):
    """The single-matmul shape computes the SAME contraction as the chunked
    sum (zero basis rows kill the scratch pad lanes), so the partial sums
    agree to MXU reduction-order tolerance."""
    x = jnp.asarray((rng.standard_normal((2, 20000)) * 0.3
                     ).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((2, 20000)) * 0.3
                     ).astype(np.float32))
    a = np.asarray(fused_loss.loss_partials(x, y, n_fft, hop, win, False))
    b = np.asarray(fused_loss.loss_partials(x, y, n_fft, hop, win, True))
    np.testing.assert_allclose(a, b, rtol=2e-4)


@pytest.mark.parametrize("n_fft,hop,win", RESOLUTIONS)
def test_wide_grad_matches_chunked(rng, n_fft, hop, win):
    """Both kernel shapes feed the identical XLA fold, so waveform
    cotangents agree to bf16-rounding tolerance.  All three resolutions:
    512/50 is the heaviest-padded geometry (hp 50->128), 2048/240 is the
    only one where wide halves tb (64) and pads hop to 256."""
    x = jnp.asarray((rng.standard_normal((1, 9000)) * 0.3
                     ).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((1, 9000)) * 0.3
                     ).astype(np.float32))
    gc = jax.grad(lambda x: jnp.sum(fused_loss.loss_partials(
        x, y, n_fft, hop, win, False)[:, (0, 2)]))(x)
    gw = jax.grad(lambda x: jnp.sum(fused_loss.loss_partials(
        x, y, n_fft, hop, win, True)[:, (0, 2)]))(x)
    gc, gw = np.asarray(gc), np.asarray(gw)
    scale = np.abs(gc).max()
    assert np.abs(gw - gc).max() / scale < 2e-2
    cos = (gw * gc).sum() / (np.linalg.norm(gw) * np.linalg.norm(gc))
    assert cos > 0.9999
