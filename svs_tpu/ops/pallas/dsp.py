"""Pallas TPU kernels for the spectrogram front-end.

``stft_magnitude`` fuses framing + windowing + real-DFT + magnitude into ONE
kernel pass: only the hop-reshaped signal streams HBM->VMEM and only the
magnitude returns to HBM — the XLA path materialises the (n_frames, n_fft)
frame matrix and the complex spectrum in HBM between ops.

Kernel formulation (Mosaic-friendly — no in-kernel concats or offset slices):
with K = ceil(n_fft / hop), frame f = [z[f], z[f+1], ..] rows of the
hop-reshaped signal, and the windowed DFT factored as a block matrix,

    |STFT|[f, :] = | sum_j  z[f+j] @ WD_j |,   WD_j = diag(w)·DFT rows
                                                  [j*hop, (j+1)*hop)

so each grid block is K aligned (TB, hop) x (hop, n_bins) MXU matmuls per
cos/sin basis, accumulated in f32, plus a VPU magnitude.  The K shifted views
of the signal are strided XLA slices prepared outside the kernel.

``stft_magphase`` extends the same kernel to ALSO emit the unit-phase
real/imag planes (librosa.magphase contract, reference data.py:80: phase of a
zero bin is 1+0j) — the phase is a VPU epilogue on the re/im accumulators that
were already in registers, so magnitude+phase costs the same matmuls as
magnitude alone.  This is the production preprocessing front-end: on TPU,
``svs_tpu.data.prep.stft_magphase`` routes through it by default (XLA
fallback elsewhere; equivalence pinned in tests/test_pallas.py).

``stft_magnitude`` remains the phase-free variant for gradient-free
magnitude-only consumers and the ``svs-bench --frontend`` comparison.
Correctness of both is pinned to svs_tpu.ops.stft (itself torch/librosa-
pinned) in interpret mode (CPU) and compiled (TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _windowed_dft(n_fft: int, hop: int, k: int, n_bins_padded: int):
    """(k, hop, n_bins_padded) cos/sin bases with the hann window folded in;
    rows past n_fft (the last chunk's padding) are zero."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    f = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * f / n_fft
    # periodic hann in numpy (host-side constant; dsp.hann_window would be a
    # tracer under jit)
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
         ).astype(np.float32)[:, None]
    cos = np.zeros((k * hop, n_bins_padded), np.float32)
    sin = np.zeros((k * hop, n_bins_padded), np.float32)
    cos[:n_fft, :n_bins] = np.cos(ang) * w
    sin[:n_fft, :n_bins] = -np.sin(ang) * w  # rfft sign convention
    return (cos.reshape(k, hop, n_bins_padded),
            sin.reshape(k, hop, n_bins_padded))


def _stft_mag_kernel(*refs, k_chunks):
    z_refs = refs[:k_chunks]
    cos_ref, sin_ref, out_ref = refs[k_chunks:]
    re = jnp.zeros(out_ref.shape, jnp.float32)
    im = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(k_chunks):
        zj = z_refs[j][:]
        # HIGHEST precision: the MXU's default f32 matmul truncates operands
        # to bf16 (0.05 abs err on song-scale magnitudes); full f32 keeps the
        # kernel librosa-grade (~1e-6 here) at wall-time parity with the XLA
        # FFT path (both are overhead-bound at prep sizes — see PARITY.md)
        re += jnp.dot(zj, cos_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        im += jnp.dot(zj, sin_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.sqrt(re * re + im * im)


def _frontend_operands(y: jax.Array, n_fft: int, hop_length: int, tb: int):
    """Shared launch prep: center-pad, build the K shift-aligned hop-row views
    of the signal and the windowed-DFT bases, plus the pallas_call geometry."""
    k = -(-n_fft // hop_length)
    y = jnp.pad(y.astype(jnp.float32), (n_fft // 2, n_fft // 2))
    t = y.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length

    n_blocks = -(-n_frames // tb)
    rows = n_blocks * tb
    padded = (rows + k) * hop_length
    z = jnp.pad(y, (0, padded - t)).reshape(rows + k, hop_length)
    # K shift-aligned views: z_j[f] = z[f + j]
    z_views = [jax.lax.slice_in_dim(z, j, j + rows, axis=0) for j in range(k)]

    n_bins = n_fft // 2 + 1
    n_bins_padded = -(-n_bins // 128) * 128
    cos, sin = _windowed_dft(n_fft, hop_length, k, n_bins_padded)

    z_specs = [
        pl.BlockSpec((tb, hop_length), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(k)
    ]
    basis_spec = pl.BlockSpec((k, hop_length, n_bins_padded),
                              lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    return (k, n_frames, n_blocks, rows, n_bins, n_bins_padded,
            z_views, cos, sin, z_specs, basis_spec)


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
    tb = 256  # frames per block
    (k, n_frames, n_blocks, rows, n_bins, n_bins_padded,
     z_views, cos, sin, z_specs, basis_spec) = _frontend_operands(
        y, n_fft, hop_length, tb)

    kernel = functools.partial(_stft_mag_kernel, k_chunks=k)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=z_specs + [basis_spec, basis_spec],
        out_specs=pl.BlockSpec((tb, n_bins_padded), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n_bins_padded), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * k * hop_length * n_bins_padded,
            bytes_accessed=(k * rows * hop_length
                            + rows * n_bins_padded) * 4,
            transcendentals=rows * n_bins_padded,
        ),
    )(*z_views, jnp.asarray(cos), jnp.asarray(sin))

    return out[:n_frames, :n_bins].T


def _stft_magphase_kernel(*refs, k_chunks):
    z_refs = refs[:k_chunks]
    cos_ref, sin_ref, mag_ref, pre_ref, pim_ref = refs[k_chunks:]
    re = jnp.zeros(mag_ref.shape, jnp.float32)
    im = jnp.zeros(mag_ref.shape, jnp.float32)
    for j in range(k_chunks):
        zj = z_refs[j][:]
        # full f32 matmuls — see _stft_mag_kernel for why HIGHEST matters
        re += jnp.dot(zj, cos_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        im += jnp.dot(zj, sin_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    # librosa.magphase zero-bin contract (reference data.py:80): phase = 1+0j.
    # The threshold (not > 0.0) keeps subnormal magnitudes in the 1+0j branch:
    # 1/mag overflows to inf below ~3e-39, which would put inf/NaN into the
    # phase planes where the XLA exp(1j*angle) path stays finite (ADVICE r2)
    nz = mag > 1e-30
    inv = jnp.where(nz, 1.0 / jnp.where(nz, mag, 1.0), 0.0)
    mag_ref[:] = mag
    pre_ref[:] = jnp.where(nz, re * inv, 1.0)
    pim_ref[:] = im * inv


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop_length", "interpret"))
def stft_magphase(
    y: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 768,
    interpret: bool = False,
):
    """Fused STFT + librosa.magphase of ``y (T,)`` in ONE kernel pass.

    Returns ``(mag, phase_ri)`` with the exact contract of
    ``svs_tpu.ops.stft.stft_magphase_jit`` (reference data.py:79-80):
    mag float32 (n_fft//2+1, n_frames), phase as stacked (2, F, T) float32
    real/imag planes (complex64 never crosses the axon host boundary).
    """
    if y.ndim != 1:
        raise ValueError("stft_magphase expects a 1-D signal")
    tb = 128  # smaller block than magnitude-only: 3 output planes in VMEM
    (k, n_frames, n_blocks, rows, n_bins, n_bins_padded,
     z_views, cos, sin, z_specs, basis_spec) = _frontend_operands(
        y, n_fft, hop_length, tb)

    kernel = functools.partial(_stft_magphase_kernel, k_chunks=k)
    out_spec = pl.BlockSpec((tb, n_bins_padded), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, n_bins_padded), jnp.float32)
    mag, pre, pim = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=z_specs + [basis_spec, basis_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * k * hop_length * n_bins_padded,
            bytes_accessed=(k * rows * hop_length
                            + 3 * rows * n_bins_padded) * 4,
            transcendentals=2 * rows * n_bins_padded,
        ),
    )(*z_views, jnp.asarray(cos), jnp.asarray(sin))

    mag = mag[:n_frames, :n_bins].T
    phase_ri = jnp.stack([pre[:n_frames, :n_bins].T,
                          pim[:n_frames, :n_bins].T])
    return mag, phase_ri

