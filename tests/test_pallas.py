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


def test_stft_magphase_matches_xla(rng):
    """The production prep kernel: mag + unit-phase planes vs the exact-FFT
    path (ops.stft.stft_magphase_jit)."""
    y = (rng.standard_normal(100_000) * 0.3).astype(np.float32)
    want_mag, want_ri = map(
        np.asarray, dsp.stft_magphase_jit(jnp.asarray(y), n_fft=1024,
                                          hop_length=768))
    got_mag, got_ri = map(
        np.asarray, pdsp.stft_magphase(jnp.asarray(y), 1024, 768,
                                       interpret=True))
    assert got_mag.shape == want_mag.shape
    assert got_ri.shape == want_ri.shape
    np.testing.assert_allclose(got_mag, want_mag, atol=2e-3, rtol=1e-4)
    # unit-phase planes are exactly unit-norm wherever the bin is non-zero
    norm = np.hypot(got_ri[0], got_ri[1])
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)
    # phase is only well-conditioned where the magnitude is significant:
    # compare the reconstructed complex spectrum instead, which is stable
    # everywhere (mag*phase == re + i*im on both sides)
    np.testing.assert_allclose(got_mag * got_ri[0], want_mag * want_ri[0],
                               atol=2e-3)
    np.testing.assert_allclose(got_mag * got_ri[1], want_mag * want_ri[1],
                               atol=2e-3)


def test_stft_magphase_zero_signal_phase_is_one(rng):
    """librosa.magphase contract (reference data.py:80): zero bins get
    phase 1+0j."""
    _, ri = pdsp.stft_magphase(jnp.zeros(8192), 1024, 768, interpret=True)
    ri = np.asarray(ri)
    np.testing.assert_array_equal(ri[0], 1.0)
    np.testing.assert_array_equal(ri[1], 0.0)


def test_prep_pallas_impl_matches_xla(rng):
    """data.prep.stft_magphase(impl='pallas') == impl='xla' on a real-length
    signal (the production default on TPU routes through the kernel)."""
    from svs_tpu.data import prep

    y = (rng.standard_normal(3 * 8192) * 0.2).astype(np.float32)
    mag_x, ph_x = prep.stft_magphase(y, 1024, 768, impl="xla")
    mag_p, ph_p = prep.stft_magphase(y, 1024, 768, impl="pallas")
    assert mag_p.shape == mag_x.shape and ph_p.shape == ph_x.shape
    np.testing.assert_allclose(mag_p, mag_x, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(mag_p * ph_p.real, mag_x * ph_x.real, atol=2e-3)
    np.testing.assert_allclose(mag_p * ph_p.imag, mag_x * ph_x.imag, atol=2e-3)
