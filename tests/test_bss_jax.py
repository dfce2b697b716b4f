"""Device-path BSS eval (evaluation/bss_jax.py) vs the numpy implementation.

The numpy path is itself pinned against unconditional goldens and a
brute-force second implementation (test_bss.py), so agreement here chains
the jitted core to those anchors.
"""

import numpy as np
import pytest

from svs_tpu.evaluation import bss, bss_jax


def _material(rng, t=5000):
    v = rng.standard_normal(t)
    a = rng.standard_normal(t) * 0.5
    mix = v + a
    est = v + 0.1 * rng.standard_normal(t) + 0.05 * a
    return mix, v, est


def test_f64_parity_with_numpy(rng):
    mix, v, est = _material(rng)
    refs = np.stack([v, mix - v])
    ests = np.stack([est, mix - est])
    r_np = bss.bss_eval_sources(refs, ests)
    r_jx = bss_jax.bss_eval_sources(refs, ests, dtype="float64")
    for a_np, a_jx in zip(r_np, r_jx):
        np.testing.assert_allclose(np.asarray(a_jx, float),
                                   np.asarray(a_np, float),
                                   rtol=0, atol=1e-9)


def test_permutation_detected_like_numpy(rng):
    mix, v, est = _material(rng)
    refs = np.stack([v, mix - v])
    ests = np.stack([mix - est, est])  # estimates swapped
    r_np = bss.bss_eval_sources(refs, ests)
    r_jx = bss_jax.bss_eval_sources(refs, ests, dtype="float64")
    np.testing.assert_array_equal(r_jx[3], r_np[3])
    assert list(r_jx[3]) == [1, 0]
    for a_np, a_jx in zip(r_np[:3], r_jx[:3]):
        np.testing.assert_allclose(a_jx, a_np, rtol=0, atol=1e-9)


def test_trailing_zero_padding_is_exact(rng):
    # Both lengths land in the same FFT bucket: identical jitted program,
    # and the module docstring's invariance argument says identical values.
    mix, v, est = _material(rng, t=5000)
    refs = np.stack([v, mix - v])
    ests = np.stack([est, mix - est])
    r_full = bss_jax.bss_eval_sources(refs, ests, dtype="float64")
    r_cut = bss_jax.bss_eval_sources(refs[:, :4500], ests[:, :4500],
                                     dtype="float64")
    r_cut_np = bss.bss_eval_sources(refs[:, :4500], ests[:, :4500])
    for a_jx, a_np in zip(r_cut[:3], r_cut_np[:3]):
        np.testing.assert_allclose(a_jx, a_np, rtol=0, atol=1e-9)
    # and the cut result is genuinely different material from the full one
    assert not np.allclose(r_cut[0], r_full[0])


def test_track_metrics_parity_and_f32_tolerance(rng):
    # correlated "musical" bed — worse Gram conditioning than white noise
    t = np.arange(6000) / 8192.0
    bed = np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
    v = 0.7 * bed + 0.3 * rng.standard_normal(t.size)
    a = 0.6 * bed + 0.4 * rng.standard_normal(t.size)
    mix = v + a
    est = v + 0.2 * a + 0.05 * rng.standard_normal(t.size)

    m_np = bss.compute_metrics_for_track(mix, v, est)
    m_64 = bss_jax.compute_metrics_for_track(mix, v, est, dtype="float64")
    m_32 = bss_jax.compute_metrics_for_track(mix, v, est, dtype="float32")
    for k in m_np:
        assert abs(m_64[k] - m_np[k]) < 1e-9, k
        # the documented f32 (TPU-default) tolerance, with headroom
        assert abs(m_32[k] - m_np[k]) < 2e-2, k


def test_validation_matches_numpy_path(rng):
    v = rng.standard_normal(1000)
    with pytest.raises(ValueError, match="shapes differ"):
        bss_jax.bss_eval_sources(np.stack([v, v]), v[None, :500])
    with pytest.raises(ValueError, match="all-silent"):
        bss_jax.bss_eval_sources(np.stack([v, np.zeros(1000)]),
                                 np.stack([v, v]))


def test_singular_gram_falls_back_to_numpy(rng):
    # ref 2 = one-sample delay of ref 1: the delayed-versions subspaces
    # coincide, the joint Gram is singular.  numpy's path lstsq-falls-back
    # (bss.py:62-64); the device path must detect the NaNs and delegate,
    # never return garbage.
    v = rng.standard_normal(3000)
    r2 = np.roll(v, 1)
    r2[0] = 0.0
    refs = np.stack([v, r2])
    est = v + 0.01 * rng.standard_normal(3000)
    ests = np.stack([est, np.roll(est, 1)])
    r_np = bss.bss_eval_sources(refs, ests)
    r_jx = bss_jax.bss_eval_sources(refs, ests, dtype="float64")
    for a_np, a_jx in zip(r_np, r_jx):
        arr = np.asarray(a_jx, float)
        assert np.all(np.isfinite(arr) | np.isinf(arr))
        np.testing.assert_allclose(arr, np.asarray(a_np, float),
                                   rtol=1e-6, atol=1e-6)
