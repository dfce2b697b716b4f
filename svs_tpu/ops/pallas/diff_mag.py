"""Differentiable fused |STFT| Pallas kernel (custom VJP) for the MR-STFT
training loss.

The XLA matmul-DFT loss path (losses/mrstft._spectral_mag_matmul) still
materialises the (B, n_frames, n_fft) frame tensor in HBM between the framing
slices and the matmul, forward and backward.  This kernel fuses framing +
windowed-DFT + magnitude into one pass over the hop-reshaped waveform:

  forward:  mag[b, f, :] = |sum_j z[b, f+j] @ WD_j|        (K MXU matmuls)
  backward: recompute re/im, scale the magnitude cotangent, and emit K
            DISJOINT per-shift planes  dP_j = g_re @ WD_j^T + g_im @ WD_j^T;
            XLA shift-adds the planes back into the waveform cotangent and
            undoes the reflect padding (mirror-add at the edges).

The recompute-in-backward choice (pallas_guide.md custom-VJP pattern) keeps
residuals to just the hop-rows view — no re/im tensors round-trip HBM.

Matmuls run in bfloat16 with f32 accumulation, matching the production
``mr_mag_impl='matmul_bf16'`` numerics.  Exposed as
``mr_mag_impl='pallas_bf16'``; correctness is pinned to the XLA path in
interpret mode (CPU) and on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 256        # frames per grid block
_EPS = 1e-8      # power clip, matches auraloss (losses/mrstft.py)

_INTERPRET = False  # set True in tests on CPU


@functools.lru_cache(maxsize=16)
def _bases(n_fft: int, hop: int, win: int, k: int, nbp: int):
    """(k, hop, nbp) cos/sin DFT bases (shared construction in
    ops.stft.centered_hann_dft), hop-chunked, bin-padded to nbp, and
    pre-cast to bfloat16 — shipping bf16 to VMEM halves the kernel's
    dominant footprint and is bit-identical to casting in-kernel.
    Cached as numpy (a traced constant would leak across jit traces)."""
    from svs_tpu.ops.stft import centered_hann_dft
    import ml_dtypes

    n_bins = n_fft // 2 + 1
    c, s = centered_hann_dft(n_fft, win)
    cos = np.zeros((k * hop, nbp), np.float32)
    sin = np.zeros((k * hop, nbp), np.float32)
    cos[:n_fft, :n_bins] = c
    sin[:n_fft, :n_bins] = s
    bf16 = ml_dtypes.bfloat16
    return (cos.reshape(k, hop, nbp).astype(bf16),
            sin.reshape(k, hop, nbp).astype(bf16))


def _geometry(t: int, n_fft: int, hop: int, tb: int = _TB):
    k = -(-n_fft // hop)
    t_padded = t + 2 * (n_fft // 2)  # reflect pad
    n_frames = 1 + (t_padded - n_fft) // hop
    n_blocks = -(-n_frames // tb)
    rows = n_blocks * tb
    n_bins = n_fft // 2 + 1
    nbp = -(-n_bins // 128) * 128
    return k, n_frames, n_blocks, rows, n_bins, nbp


def _z_views(x: jax.Array, n_fft: int, hop: int):
    """Reflect-pad and hop-reshape x (B, T) -> K shifted row views, each
    (B, rows, hop)."""
    b, t = x.shape
    k, _, _, rows, _, _ = _geometry(t, n_fft, hop)
    xp = jnp.pad(x, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
    padded = (rows + k) * hop
    z = jnp.pad(xp, [(0, 0), (0, padded - xp.shape[1])]
                ).reshape(b, rows + k, hop)
    return [jax.lax.slice_in_dim(z, j, j + rows, axis=1) for j in range(k)]


def _fwd_kernel(*refs, k):
    z_refs = refs[:k]
    cos_ref, sin_ref, out_ref = refs[k:]
    re = jnp.zeros(out_ref.shape[1:], jnp.float32)
    im = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for j in range(k):
        zj = z_refs[j][0].astype(jnp.bfloat16)
        re += jnp.dot(zj, cos_ref[j], preferred_element_type=jnp.float32)
        im += jnp.dot(zj, sin_ref[j], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.sqrt(jnp.clip(re * re + im * im, _EPS, None))


def _bwd_kernel(*refs, k):
    z_refs = refs[:k]
    cos_ref, sin_ref, g_ref = refs[k:k + 3]
    plane_refs = refs[k + 3:]
    re = jnp.zeros(g_ref.shape[1:], jnp.float32)
    im = jnp.zeros(g_ref.shape[1:], jnp.float32)
    for j in range(k):
        zj = z_refs[j][0].astype(jnp.bfloat16)
        re += jnp.dot(zj, cos_ref[j], preferred_element_type=jnp.float32)
        im += jnp.dot(zj, sin_ref[j], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mag = jnp.sqrt(jnp.clip(power, _EPS, None))
    # d mag / d re = re / mag where the clip is inactive, else 0
    live = (power >= _EPS).astype(jnp.float32)
    scale = g_ref[0] * live / mag
    gre = (scale * re).astype(jnp.bfloat16)
    gim = (scale * im).astype(jnp.bfloat16)
    for j in range(k):
        dz = jnp.dot(gre, cos_ref[j].T, preferred_element_type=jnp.float32)
        dz += jnp.dot(gim, sin_ref[j].T, preferred_element_type=jnp.float32)
        plane_refs[j][0] = dz


def _run_fwd(x, n_fft, hop, win):
    b, t = x.shape
    k, n_frames, n_blocks, rows, n_bins, nbp = _geometry(t, n_fft, hop)
    cos, sin = _bases(n_fft, hop, win, k, nbp)
    z_views = _z_views(x, n_fft, hop)

    z_spec = pl.BlockSpec((1, _TB, hop), lambda bb, i: (bb, i, 0),
                          memory_space=pltpu.VMEM)
    basis = pl.BlockSpec((k, hop, nbp), lambda bb, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=(b, n_blocks),
        in_specs=[z_spec] * k + [basis, basis],
        out_specs=pl.BlockSpec((1, _TB, nbp), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, nbp), jnp.float32),
        interpret=_INTERPRET,
    )(*z_views, jnp.asarray(cos), jnp.asarray(sin))
    # (B, rows, nbp) -> (B, n_bins, n_frames)
    return jnp.swapaxes(out[:, :n_frames, :n_bins], 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def spectral_mag(x: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """Differentiable fused |STFT| of x (B, T) -> (B, n_bins, n_frames);
    reflect-padded, centred hann window, power clipped at 1e-8."""
    return _run_fwd(x, n_fft, hop, win)


def _vjp_fwd(x, n_fft, hop, win):
    return _run_fwd(x, n_fft, hop, win), x


def _vjp_bwd(n_fft, hop, win, x, g):
    b, t = x.shape
    k, n_frames, n_blocks, rows, n_bins, nbp = _geometry(t, n_fft, hop)
    cos, sin = _bases(n_fft, hop, win, k, nbp)
    z_views = _z_views(x, n_fft, hop)

    # cotangent back to kernel layout, zero-padded to (B, rows, nbp)
    gt = jnp.swapaxes(g, 1, 2)  # (B, n_frames, n_bins)
    gt = jnp.pad(gt.astype(jnp.float32),
                 [(0, 0), (0, rows - n_frames), (0, nbp - n_bins)])

    z_spec = pl.BlockSpec((1, _TB, hop), lambda bb, i: (bb, i, 0),
                          memory_space=pltpu.VMEM)
    basis = pl.BlockSpec((k, hop, nbp), lambda bb, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, _TB, hop), lambda bb, i: (bb, i, 0),
                              memory_space=pltpu.VMEM)
    planes = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=(b, n_blocks),
        in_specs=[z_spec] * k + [basis, basis,
                                 pl.BlockSpec((1, _TB, nbp),
                                              lambda bb, i: (bb, i, 0),
                                              memory_space=pltpu.VMEM)],
        out_specs=[plane_spec] * k,
        out_shape=[jax.ShapeDtypeStruct((b, rows, hop), jnp.float32)
                   for _ in range(k)],
        interpret=_INTERPRET,
    )(*z_views, jnp.asarray(cos), jnp.asarray(sin), gt)

    # fold the K shifted planes back into the padded waveform cotangent:
    # plane j's row f lands on hop-rows [f + j]
    dz = jnp.zeros((b, rows + k, hop), jnp.float32)
    for j in range(k):
        dz = dz.at[:, j:j + rows, :].add(planes[j])
    pad = n_fft // 2
    t_padded = t + 2 * pad
    dxp = dz.reshape(b, -1)[:, :t_padded]
    # reflect-pad backward: mirror-add the edge gradients
    # (xp[i] = x[pad - i] left, xp[pad+T+i] = x[T-2-i] right)
    dx = dxp[:, pad:pad + t]
    dx = dx.at[:, 1:pad + 1].add(dxp[:, :pad][:, ::-1])
    dx = dx.at[:, t - pad - 1:t - 1].add(dxp[:, pad + t:][:, ::-1])
    return (dx,)


spectral_mag.defvjp(_vjp_fwd, _vjp_bwd)
