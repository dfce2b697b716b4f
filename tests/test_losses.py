"""Loss parity tests vs torch oracles.

- patch_istft vs the reference specific_istft semantics (train.py:33-60):
  DC re-pad -> torch.polar -> torch.istft
- mr_stft_loss vs an in-test torch replication of the auraloss
  MultiResolutionSTFTLoss default formula (train.py:26)
- masked_l1_pair vs nn.L1Loss arithmetic (train.py:274-283)
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from svs_tpu.losses import masked_l1, mrstft
from svs_tpu.utils.config import SVSConfig


def torch_specific_istft(mag, angle, n_fft=1024, hop=768):
    m = F.pad(torch.from_numpy(mag), (0, 0, 1, 0))
    a = F.pad(torch.from_numpy(angle), (0, 0, 1, 0))
    cplx = torch.polar(m, a)
    return torch.istft(
        cplx, n_fft=n_fft, hop_length=hop, win_length=n_fft,
        window=torch.hann_window(n_fft), return_complex=False,
    ).numpy()


def torch_mr_stft(x, y):
    """auraloss MultiResolutionSTFTLoss default formula, replicated."""
    total = 0.0
    for n_fft, hop, win in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        w = torch.hann_window(win)
        def mag(sig):
            S = torch.stft(torch.from_numpy(sig), n_fft, hop, win, w,
                           return_complex=True)
            return torch.sqrt(torch.clamp(S.real**2 + S.imag**2, min=1e-8))
        xm, ym = mag(x), mag(y)
        sc = torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")
        lm = F.l1_loss(torch.log(xm), torch.log(ym))
        total = total + sc + lm
    return float(total) / 3.0


def test_patch_istft_matches_torch(rng):
    mag = rng.random((2, 512, 128)).astype(np.float32)
    angle = ((rng.random((2, 512, 128)) - 0.5) * 6).astype(np.float32)
    theirs = torch_specific_istft(mag, angle)
    ours = np.asarray(mrstft.patch_istft(jnp.asarray(mag), jnp.asarray(angle)))
    assert ours.shape == theirs.shape == (2, 768 * 127)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_mr_stft_loss_matches_auraloss_formula(rng):
    x = rng.standard_normal((2, 30000)).astype(np.float32) * 0.1
    y = x + rng.standard_normal((2, 30000)).astype(np.float32) * 0.02
    theirs = torch_mr_stft(x, y)
    ours = float(mrstft.mr_stft_loss(jnp.asarray(x), jnp.asarray(y),
                                     impl="fft"))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3)
    # the fast MXU path must stay within ~1% of the parity path
    fast = float(mrstft.mr_stft_loss(jnp.asarray(x), jnp.asarray(y),
                                     impl="matmul_bf16"))
    np.testing.assert_allclose(fast, theirs, rtol=2e-2)


def test_mr_stft_zero_for_identical(rng):
    x = rng.standard_normal(20000).astype(np.float32)
    assert float(mrstft.mr_stft_loss(jnp.asarray(x), jnp.asarray(x))) < 1e-5


def test_masked_l1_pair(rng):
    mix = rng.random((2, 512, 128)).astype(np.float32)
    voc = (rng.random((2, 512, 128)) * 0.5).astype(np.float32)
    mask = rng.random((2, 512, 128)).astype(np.float32)
    total, pred_vocal = masked_l1.masked_l1_pair(
        jnp.asarray(mask), jnp.asarray(mix), jnp.asarray(voc))
    tm, tv, tk = map(torch.from_numpy, (mix, voc, mask))
    l1 = torch.nn.L1Loss()
    theirs = l1(tk * tm, tv) + l1((1 - tk) * tm, torch.clamp(tm - tv, min=0.0))
    np.testing.assert_allclose(float(total), float(theirs), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_vocal), (mask * mix), atol=1e-7)


def test_weighted_l1_fixed_semantics(rng):
    """The intended WeightedL1Loss math (reference model.py:15-40 with the
    reduction bug fixed): weight = per-row summed L1 diff."""
    mix = rng.random((2, 8, 4)).astype(np.float32)
    voc = (rng.random((2, 8, 4)) * 0.5).astype(np.float32)
    mask = rng.random((2, 8, 4)).astype(np.float32)

    def weighted_np(pred, target):
        diff = np.abs(pred - target)
        return diff * diff.sum(-1, keepdims=True)

    pv, pa = mask * mix, (1 - mask) * mix
    ta = np.clip(mix - voc, 0, None)
    expected = (weighted_np(pv, voc) + weighted_np(pa, ta)).mean()
    got = float(masked_l1.weighted_l1(
        jnp.asarray(voc), jnp.asarray(mix), jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    # sum + none reductions
    got_sum = float(masked_l1.weighted_l1(
        jnp.asarray(voc), jnp.asarray(mix), jnp.asarray(mask), reduction="sum"))
    np.testing.assert_allclose(
        got_sum, (weighted_np(pv, voc) + weighted_np(pa, ta)).sum(), rtol=1e-5)


def test_combined_loss_weighting(rng):
    cfg = SVSConfig()
    mix = rng.random((2, 512, 128)).astype(np.float32)
    voc = (mix * 0.4).astype(np.float32)
    ang = ((rng.random((2, 512, 128)) - 0.5) * 6).astype(np.float32)
    mask = np.full_like(mix, 0.5)
    total, aux = mrstft.combined_loss(
        jnp.asarray(mask), jnp.asarray(mix), jnp.asarray(voc),
        jnp.asarray(ang), jnp.asarray(ang), cfg)
    np.testing.assert_allclose(
        float(total),
        cfg.alpha_l1 * float(aux["l1"]) + cfg.alpha_mr * float(aux["mr"]),
        rtol=1e-6,
    )
    assert np.isfinite(float(total))


def test_mr_stft_grad_finite_at_exact_zero_diff(rng):
    """The SC numerator norm used to NaN its VJP when pred == target exactly
    (0/0 in x/||x||) — hit by dead all-padded PP microbatches (both mags at
    the clip floor) and by exactly-perfect predictions.  _norm0 defines the
    subgradient at 0 as 0; values are unchanged (test above)."""
    import jax

    x = rng.standard_normal((2, 20000)).astype(np.float32)
    for impl in ("fft", "matmul_bf16"):
        g = jax.grad(lambda a: mrstft.mr_stft_loss(
            a, jnp.asarray(x), impl=impl))(jnp.asarray(x))
        assert np.isfinite(np.asarray(g)).all(), impl
    # all-zero pred AND target (the dead-microbatch case), weighted
    z = jnp.zeros((2, 20000), jnp.float32)
    w = jnp.ones((2,), jnp.float32)
    g = jax.grad(lambda a: mrstft.mr_stft_loss(a, z, weight=w))(z)
    assert np.isfinite(np.asarray(g)).all()
