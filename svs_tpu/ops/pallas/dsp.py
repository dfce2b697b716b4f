"""Pallas TPU kernels for the spectrogram front-end.

``stft_magnitude`` fuses framing + windowing + real-DFT + magnitude into ONE
kernel: the hop-reshaped signal streams HBM->VMEM once per block, frames are
assembled in-register from overlapping row blocks (the K-chunk trick from
svs_tpu.ops.stft), windowed on the VPU, and projected against cos/sin DFT
bases on the MXU; only the magnitude ever returns to HBM.  The XLA path
materialises the (n_frames, n_fft) frame matrix and the complex spectrum in
HBM between ops — this kernel eliminates both round trips.

Used where gradients aren't needed (inference/eval paths, magnitude-only
analysis); the training loss keeps the XLA STFT, which autodiffs.

Correctness is pinned to svs_tpu.ops.stft (itself torch/librosa-pinned) by
tests in interpret mode (CPU) and compiled mode (TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svs_tpu.ops import stft as dsp


def _dft_bases(n_fft: int, n_bins_padded: int) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin projection matrices (n_fft, n_bins_padded); columns past
    n_fft//2+1 are zero so padded lanes contribute nothing."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    cos = np.zeros((n_fft, n_bins_padded), np.float32)
    sin = np.zeros((n_fft, n_bins_padded), np.float32)
    cos[:, :n_bins] = np.cos(ang)
    sin[:, :n_bins] = -np.sin(ang)  # rfft convention: X_k = sum x_t e^{-i..}
    return cos, sin


def _stft_mag_kernel(z_ref, tails_ref, w_ref, cos_ref, sin_ref, out_ref, *,
                     k_chunks, n_fft):
    tb = out_ref.shape[0]
    # (tb + k, hop): this block's rows plus the next block's first k rows
    rows = jnp.concatenate([z_ref[:], tails_ref[0]], axis=0)
    parts = [rows[j:j + tb, :] for j in range(k_chunks)]
    frames = jnp.concatenate(parts, axis=1)[:, :n_fft] * w_ref[:]
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop_length", "interpret"))
def stft_magnitude(
    y: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """Fused |STFT| of ``y (T,)`` -> (n_fft//2+1, n_frames) float32.

    librosa-compatible (center=True, constant pad, periodic hann) like
    svs_tpu.ops.stft.stft.
    """
    if y.ndim != 1:
        raise ValueError("stft_magnitude expects a 1-D signal")
    k = -(-n_fft // hop_length)
    y = jnp.pad(y.astype(jnp.float32), (n_fft // 2, n_fft // 2))
    t = y.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length

    tb = 256  # frames per block
    n_blocks = -(-n_frames // tb)
    rows_needed = n_blocks * tb + k
    padded = rows_needed * hop_length
    z = jnp.pad(y, (0, padded - t)).reshape(rows_needed, hop_length)
    # per-block boundary rows: block i also needs rows
    # [(i+1)*tb, (i+1)*tb + k) — blocks can't overlap in a BlockSpec, so the
    # k boundary rows per block ride along as a tiny side input
    tail_idx = (jnp.arange(n_blocks) + 1)[:, None] * tb + jnp.arange(k)
    tails = z[tail_idx]  # (n_blocks, k, hop)

    n_bins = n_fft // 2 + 1
    n_bins_padded = -(-n_bins // 128) * 128
    cos, sin = _dft_bases(n_fft, n_bins_padded)
    window = dsp.hann_window(n_fft).reshape(1, n_fft)

    kernel = functools.partial(_stft_mag_kernel, k_chunks=k, n_fft=n_fft)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, hop_length), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, hop_length), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, n_bins_padded), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * tb, n_bins_padded),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_blocks * tb * n_fft * n_bins_padded,
            bytes_accessed=(padded + n_blocks * tb * n_bins_padded) * 4,
            transcendentals=n_blocks * tb * n_bins_padded,
        ),
    )(z, tails, jnp.asarray(window), jnp.asarray(cos), jnp.asarray(sin))

    return out[:n_frames, :n_bins].T
