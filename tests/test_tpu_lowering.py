"""Every Pallas kernel family AOT-lowers for the TPU platform from a
CPU-only process.

The kernels' VALUES are pinned in interpret mode elsewhere
(test_pallas/test_diff_mag/test_fused_loss); this file guards the other
failure axis — a kernel that stops *lowering* through Pallas->Mosaic
(unsupported op, bad block spec, scratch misuse) would otherwise pass the
whole CPU suite and only break on the chip.  ``jax.jit(...).trace(...)
.lower(lowering_platforms=("tpu",))`` runs that pipeline and embeds the
Mosaic module as a tpu_custom_call without needing a device (Mosaic's
device-side layout passes still only run on real hardware; this catches
the structural layer).
"""

import jax
import jax.numpy as jnp
import pytest


def _lower_for_tpu(fn, *args):
    lowered = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text, "no Mosaic custom call in the module"
    return text


def test_prep_frontend_kernels_lower():
    """ops/pallas/dsp.py: the production prep front-end (magnitude and
    magphase) at the reference geometry (window 1024 / hop 768)."""
    from svs_tpu.ops.pallas import dsp

    y = jnp.zeros((120000,), jnp.float32)
    _lower_for_tpu(lambda y: dsp.stft_magnitude(y, n_fft=1024,
                                                hop_length=768), y)
    _lower_for_tpu(lambda y: dsp.stft_magphase(y, n_fft=1024,
                                               hop_length=768)[0], y)


def test_diff_mag_fwd_bwd_lower():
    """ops/pallas/diff_mag.py: the differentiable |STFT| custom VJP at the
    first loss resolution."""
    from svs_tpu.ops.pallas import diff_mag

    x = jnp.zeros((2, 20000), jnp.float32)
    _lower_for_tpu(
        lambda x: jax.value_and_grad(lambda x: jnp.sum(
            diff_mag.spectral_mag(x, 1024, 120, 600)))(x), x)


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("n_fft,hop,win",
                         [(1024, 120, 600), (2048, 240, 1200),
                          (512, 50, 240)])
def test_fused_loss_fwd_bwd_lower(n_fft, hop, win, wide):
    """ops/pallas/fused_loss.py: both kernel shapes, every resolution,
    through the gradient (the bwd kernel is the one with scratch + wide
    dots + hop-wide plane slices)."""
    from svs_tpu.ops.pallas import fused_loss

    x = jnp.zeros((2, 20000), jnp.float32)
    y = jnp.zeros((2, 20000), jnp.float32)
    # value_and_grad keeps BOTH kernels alive (grad alone DCEs the fwd)
    _lower_for_tpu(
        lambda x, y: jax.value_and_grad(
            lambda x: jnp.sum(fused_loss.loss_partials(
                x, y, n_fft, hop, win, wide)[:, (0, 2)]))(x), x, y)
