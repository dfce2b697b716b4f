"""Multi-resolution STFT waveform loss + the patch iSTFT feeding it.

Rebuilds the reference's auraloss ``MultiResolutionSTFTLoss`` (constructed at
reference train.py:26 with default resolutions) and its ``specific_istft``
helper (reference train.py:33-60) as jit/grad-safe JAX, so the entire
loss graph — U-Net -> mask -> iSTFT -> 3x STFT — compiles into ONE XLA
program instead of the reference's scattered host-driven ops.

auraloss default semantics replicated:
- resolutions (fft, hop, win) = (1024,120,600), (2048,240,1200), (512,50,240)
- per resolution: spectral convergence  ||  |Y|-|X| ||_F / || |Y| ||_F
  plus log-magnitude L1  mean| log|X| - log|Y| |
- magnitudes are sqrt(clamp(|S|^2, min=1e-8)); torch.stft with centred
  (zero-padded) hann windows and reflect padding
- total = mean over resolutions
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from svs_tpu.ops import stft as dsp
from svs_tpu.utils.config import SVSConfig


def patch_istft(
    mag: jax.Array,
    angle: jax.Array,
    *,
    n_fft: int = 1024,
    hop_length: int = 768,
) -> jax.Array:
    """Reference ``specific_istft`` (train.py:33-60): re-pad the dropped DC
    bin (512 -> 513), combine magnitude with phase angle, iSTFT.

    Args:  mag, angle: (..., 512, T) float (DC bin dropped at train.py:110-113).
    Returns: (..., hop*(T-1)) float32 waveform.
    """
    pad = [(0, 0)] * (mag.ndim - 2) + [(1, 0), (0, 0)]
    mag = jnp.pad(mag, pad)
    angle = jnp.pad(angle, pad)
    spec = dsp.polar(mag, angle)
    return dsp.istft(spec, hop_length=hop_length, win_length=n_fft, n_fft=n_fft)


def _spectral_mag_fft(x: jax.Array, n_fft: int, hop: int, win: int
                      ) -> jax.Array:
    S = dsp.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                 pad_mode="reflect")
    power = jnp.real(S) ** 2 + jnp.imag(S) ** 2
    return jnp.sqrt(jnp.clip(power, 1e-8, None))


@functools.lru_cache(maxsize=16)
def _dft_filters(n_fft: int, win: int):
    """(n_fft, 2*(n_fft//2+1)) cos|sin windowed-DFT bank (shared construction
    in ops.stft.centered_hann_dft).

    Caches the NUMPY array: a jnp array built during a trace would cache a
    tracer and leak it into later traces (UnexpectedTracerError); numpy
    constants are staged fresh per trace.  Note the sin half carries rfft's
    negative sign — magnitudes are sign-invariant."""
    import numpy as np

    cos, sin = dsp.centered_hann_dft(n_fft, win)
    return np.concatenate([cos, sin], axis=1)


def _spectral_mag_matmul(x: jax.Array, n_fft: int, hop: int, win: int,
                         dtype=jnp.bfloat16) -> jax.Array:
    """|STFT| as frames @ windowed-DFT-basis matmuls.

    Measured on v5e inside the train step: FFT 112.5 ms, f32 matmul 530 ms
    (f32 matmul throughput at these shapes is poor), strided-conv 1865 ms
    (XLA can't tile 2048-wide 1-D conv kernels), bf16 matmul 28.6 ms.  The
    bf16 matmul is therefore the DEFAULT (cfg.mr_mag_impl='matmul_bf16';
    loss agrees with FFT to ~1e-3 relative); ``mr_mag_impl='fft'`` is the
    exact auraloss-parity reference path.
    x: (..., T) -> (..., n_bins, n_frames).
    """
    lead = x.shape[:-1]
    xp = jnp.pad(x.reshape(-1, x.shape[-1]),
                 [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
    # cast BEFORE framing: the materialised (B, n_frames, n_fft) frame
    # tensors are the loss chain's dominant HBM traffic — writing them in the
    # matmul dtype halves it
    frames = dsp.frame_signal(xp.astype(dtype), n_fft, hop)
    # f32 MXU accumulation, but STORE the (frames, 2*bins) DFT planes in the
    # matmul dtype: they are the loss graph's largest HBM arrays (213 MB at
    # the 1024/120 resolution, B=32) and the cast fuses into the matmul
    # epilogue.  Measured on v5e: loss fwd+bwd 10.8 -> 9.1 ms, grad rel diff
    # 1.7e-4 (same class as the matmul_bf16 approximation itself).
    out = jnp.dot(frames, _dft_filters(n_fft, win).astype(dtype),
                  preferred_element_type=jnp.float32).astype(dtype)
    n_bins = n_fft // 2 + 1
    re = out[..., :n_bins].astype(jnp.float32)
    im = out[..., n_bins:].astype(jnp.float32)
    power = re * re + im * im
    mag = jnp.sqrt(jnp.clip(power, 1e-8, None))
    return jnp.swapaxes(mag, -1, -2).reshape(*lead, n_bins, -1)


def _spectral_mag_pallas(x: jax.Array, n_fft: int, hop: int, win: int
                         ) -> jax.Array:
    """Fused Pallas kernel with custom VJP (ops/pallas/diff_mag.py): framing
    + windowed-DFT + magnitude in one pass, frames never materialised in HBM.
    Same bf16-matmul numerics as 'matmul_bf16'."""
    from svs_tpu.ops.pallas.diff_mag import spectral_mag

    lead = x.shape[:-1]
    out = spectral_mag(x.reshape(-1, x.shape[-1]), n_fft, hop, win)
    return out.reshape(*lead, *out.shape[1:])


_MAG_IMPLS = {
    "fft": _spectral_mag_fft,
    "matmul_bf16": _spectral_mag_matmul,
    "pallas_bf16": _spectral_mag_pallas,
}


def _norm0(x: jax.Array) -> jax.Array:
    """Frobenius norm with a DEFINED (zero) gradient at ``x == 0``.

    ``jnp.linalg.norm``'s VJP is ``x / ||x||`` — 0/0 = NaN when the argument
    vanishes exactly, which the SC numerator does for a dead all-padded
    microbatch (both magnitudes clip to the same 1e-8 floor plane,
    parallel/pp.py liveness gating) and for an exactly-perfect prediction.
    Values equal ``jnp.linalg.norm`` everywhere; only the measure-zero
    subgradient at 0 changes (to 0, so a downstream ``* 0`` gate really
    zeroes the contribution instead of NaN-poisoning the step)."""
    ss = jnp.sum(jnp.square(x))
    return jnp.where(ss > 0, jnp.sqrt(jnp.where(ss > 0, ss, 1.0)), 0.0)


def stft_loss(
    x: jax.Array,
    y: jax.Array,
    n_fft: int,
    hop: int,
    win: int,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    impl: str = "matmul_bf16",
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Single-resolution STFT loss (auraloss STFTLoss defaults):
    spectral convergence + log-magnitude L1.  x = prediction, y = target.

    impl: 'matmul_bf16' (default — MXU windowed-DFT matmuls; 3.9x faster
    train step on v5e, loss agrees with the FFT path to ~1e-3 relative) or
    'fft' (exact auraloss-parity reference path).

    weight: optional per-example (B,) 0/1 validity mask (x, y shaped (B, T));
    zeroed examples drop out of both the Frobenius norms and the log-mag mean,
    so a zero-padded batch reproduces the unpadded loss exactly.

    Prediction and target run as separate STFTs on purpose: stacking them
    into one call measures 23% SLOWER end-to-end because the zero-cotangent
    target half can't be pruned from the backward FFT of the stacked
    tensor."""
    if impl in ("pallas_fused", "pallas_fused_wide"):
        # whole-resolution fusion: waveform -> SC/log-mag partial sums in
        # one Pallas pass, no frame/magnitude planes in HBM
        # (ops/pallas/fused_loss.py); x is the prediction, y the target.
        # '_wide' selects the single-matmul kernel shape (one K*hp-deep
        # contraction per block instead of K hop-deep ones).
        from svs_tpu.ops.pallas.fused_loss import stft_loss_fused

        if x.ndim != 2:
            x = x.reshape(-1, x.shape[-1])
            y = y.reshape(-1, y.shape[-1])
            if weight is not None:
                raise ValueError(f"{impl}: weight needs (B, T) inputs")
        return stft_loss_fused(x, y, n_fft, hop, win, weight=weight,
                               w_sc=w_sc, w_log_mag=w_log_mag,
                               wide=impl.endswith("_wide"))
    mag = _MAG_IMPLS[impl]
    x_mag = mag(x, n_fft, hop, win)
    y_mag = mag(y, n_fft, hop, win)
    if weight is None:
        sc = _norm0(y_mag - x_mag) / jnp.linalg.norm(y_mag)
        log_mag = jnp.mean(jnp.abs(jnp.log(x_mag) - jnp.log(y_mag)))
    else:
        w = weight.reshape(weight.shape + (1,) * (x_mag.ndim - 1))
        sc = (_norm0(w * (y_mag - x_mag))
              / jnp.linalg.norm(w * y_mag))
        per_example = x_mag.shape[-1] * x_mag.shape[-2]
        log_mag = (jnp.sum(w * jnp.abs(jnp.log(x_mag) - jnp.log(y_mag)))
                   / (jnp.sum(weight) * per_example))
    return w_sc * sc + w_log_mag * log_mag


def mr_stft_loss(
    x: jax.Array,
    y: jax.Array,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
    impl: str = "matmul_bf16",
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-resolution STFT loss on waveforms ``(..., T)``; prediction first,
    target second (reference train.py:293 call order)."""
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        total = total + stft_loss(x, y, n_fft, hop, win, impl=impl,
                                  weight=weight)
    return total / len(fft_sizes)


def combined_loss(
    mask: jax.Array,
    mix: jax.Array,
    voc: jax.Array,
    mix_angle: jax.Array,
    voc_angle: jax.Array,
    cfg: Optional[SVSConfig] = None,
    weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, dict]:
    """The reference's full training loss (train.py:274-296):
    alpha_L1 * (masked L1 pair) + alpha_MR * MR-STFT(pred_wav, target_wav).

    pred wav uses predicted magnitude + MIXTURE phase; target wav uses true
    vocal magnitude + vocal phase (train.py:287-290).
    Inputs are (B, 512, T) patches.  Returns (total, aux dict).

    weight: optional (B,) 0/1 validity mask — padded examples (from the
    drop-free remainder policy, parallel.mesh.shard_batch) are excluded from
    every reduction, so the loss equals the unpadded batch's exactly.
    """
    from svs_tpu.losses.masked_l1 import masked_l1_pair

    cfg = cfg or SVSConfig()
    l1_total, pred_vocal = masked_l1_pair(mask, mix, voc, weight)
    pred_wav = patch_istft(pred_vocal, mix_angle,
                           n_fft=cfg.window_size, hop_length=cfg.hop_size)
    target_wav = patch_istft(voc, voc_angle,
                             n_fft=cfg.window_size, hop_length=cfg.hop_size)
    mr = mr_stft_loss(pred_wav, target_wav, cfg.mr_fft_sizes,
                      cfg.mr_hop_sizes, cfg.mr_win_lengths,
                      impl=cfg.mr_mag_impl, weight=weight)
    total = cfg.alpha_l1 * l1_total + cfg.alpha_mr * mr
    return total, {"l1": l1_total, "mr": mr, "total": total}
