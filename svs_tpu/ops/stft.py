"""On-device STFT / iSTFT / framing primitives.

The reference does all DSP on the host with librosa (reference data.py:79-101,
data.py:159) and torch (reference train.py:51-58).  Here the same transforms are
pure-JAX so the whole pipeline — preprocessing STFT, the differentiable iSTFT
inside the training loss, and full-song decode — runs on TPU inside a single
jitted graph.

Semantics notes (parity targets):
- ``stft(...)`` with ``center=True, pad_mode='constant'`` matches
  ``librosa.stft`` (librosa 0.10 defaults, used at reference data.py:79,100),
  returning ``(..., n_fft//2+1, n_frames)`` complex64 in (freq, time) layout.
- ``stft(...)`` with ``pad_mode='reflect'`` matches ``torch.stft`` defaults
  (used inside auraloss's MR-STFT loss, reference train.py:26,293), including
  zero-centred window padding when ``win_length < n_fft``.
- ``istft(...)`` matches both ``librosa.istft`` (reference data.py:159) and
  ``torch.istft`` (reference train.py:51-58): windowed overlap-add with
  squared-window normalisation, center-trim of ``n_fft//2`` per side, default
  output length ``hop * (n_frames - 1)``.

All functions accept arbitrary leading batch dimensions and are jit/grad-safe
(static shapes only).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def centered_hann_dft(n_fft: int, win: int):
    """Host-side (numpy) real-DFT bases with a CENTRED periodic hann window
    folded in (torch.stft semantics for win <= n_fft): returns (cos, sin)
    each (n_fft, n_fft//2 + 1) float32, with rfft's  e^{-i...}  sign on sin.

    Single source of truth for the windowed-DFT banks used by the matmul
    loss magnitudes (losses/mrstft) and the Pallas kernels (ops/pallas)."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    f = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * f / n_fft
    w = np.zeros((n_fft, 1), np.float32)
    left = (n_fft - win) // 2
    w[left:left + win, 0] = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(win) / win)
    return ((np.cos(ang) * w).astype(np.float32),
            (-np.sin(ang) * w).astype(np.float32))


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window — matches ``torch.hann_window`` and
    ``scipy.signal.get_window('hann', n, fftbins=True)`` (librosa's default)."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)
    return w.astype(dtype)


def pad_center(window: jax.Array, n_fft: int) -> jax.Array:
    """Zero-pad a window symmetrically to ``n_fft`` (torch.stft semantics for
    ``win_length < n_fft``: left pad ``(n_fft - win) // 2``)."""
    win = window.shape[-1]
    if win == n_fft:
        return window
    left = (n_fft - win) // 2
    return jnp.pad(window, (left, n_fft - win - left))


def frame_signal(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice ``y (..., T)`` into overlapping frames ``(..., n_frames, frame_length)``.

    n_frames = 1 + (T - frame_length) // hop_length  (requires T >= frame_length).
    """
    t = y.shape[-1]
    if t < frame_length:
        raise ValueError(
            f"signal length {t} is shorter than frame_length {frame_length}; "
            "pad the input (or use center=True) before framing"
        )
    n_frames = 1 + (t - frame_length) // hop_length
    # Gather-free framing: view the signal as hop-sized rows and concatenate
    # K = ceil(frame/hop) shifted row-slices (the exact inverse of
    # overlap_add's K-chunk trick).  XLA lowers this to K strided copies —
    # an order of magnitude faster on TPU than the row-gather formulation
    # (21ms -> ~2ms for a 4-minute song at hop 768).
    k = -(-frame_length // hop_length)
    padded = (n_frames + k) * hop_length
    pad = [(0, 0)] * (y.ndim - 1) + [(0, padded - t)]
    z = jnp.pad(y, pad).reshape(*y.shape[:-1], n_frames + k, hop_length)
    chunks = [z[..., j : j + n_frames, :] for j in range(k)]
    return jnp.concatenate(chunks, axis=-1)[..., :frame_length]


def overlap_add(frames: jax.Array, hop_length: int) -> jax.Array:
    """Overlap-add ``frames (..., n_frames, frame_length)`` at ``hop_length``.

    Output length is ``frame_length + hop_length * (n_frames - 1)``.

    Implemented as the K-chunk shift-and-add trick (K = ceil(frame/hop)), which
    XLA fuses into K strided adds instead of a scatter — on the reference's
    hop=768 / win=1024 regime K is just 2.
    """
    *lead, n_frames, frame_length = frames.shape
    k = -(-frame_length // hop_length)  # ceil
    padded_len = k * hop_length
    if padded_len != frame_length:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, padded_len - frame_length)]
        frames = jnp.pad(frames, pad)
    chunks = frames.reshape(*lead, n_frames, k, hop_length)
    out = jnp.zeros((*lead, n_frames + k - 1, hop_length), frames.dtype)
    for j in range(k):
        out = out.at[..., j:j + n_frames, :].add(chunks[..., :, j, :])
    out = out.reshape(*lead, (n_frames + k - 1) * hop_length)
    return out[..., : frame_length + hop_length * (n_frames - 1)]


def stft(
    y: jax.Array,
    n_fft: int = 1024,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Optional[jax.Array] = None,
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Short-time Fourier transform of ``y (..., T)``.

    Returns complex64 ``(..., n_fft//2 + 1, n_frames)`` — (freq, time) layout
    matching librosa (reference data.py:79).
    """
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length)
    window = pad_center(window.astype(y.dtype), n_fft)

    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode=pad_mode)

    frames = frame_signal(y, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    # (..., n_frames, n_bins) -> (..., n_bins, n_frames)
    return jnp.swapaxes(spec, -1, -2).astype(jnp.complex64)


def istft(
    S: jax.Array,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: Optional[jax.Array] = None,
    center: bool = True,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT of ``S (..., n_bins, n_frames)`` complex.

    Windowed overlap-add with squared-window (NOLA) normalisation; matches
    ``librosa.istft`` (reference data.py:159) and ``torch.istft``
    (reference train.py:51-58) where their domains overlap.
    """
    n_bins, n_frames = S.shape[-2], S.shape[-1]
    if n_fft is None:
        n_fft = 2 * (n_bins - 1)
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4
    if window is None:
        window = hann_window(win_length)
    window = pad_center(window, n_fft).astype(jnp.float32)

    frames = jnp.fft.irfft(jnp.swapaxes(S, -1, -2), n=n_fft, axis=-1)
    frames = frames.astype(jnp.float32) * window
    y = overlap_add(frames, hop_length)

    # squared-window normalisation envelope (frame-count static under jit)
    wsq = jnp.tile(window[None, :] ** 2, (n_frames, 1))
    envelope = overlap_add(wsq, hop_length)
    y = jnp.where(envelope > 1e-11, y / jnp.maximum(envelope, 1e-11), 0.0)

    if center:
        y = y[..., n_fft // 2 : y.shape[-1] - n_fft // 2]
    if length is not None:
        if y.shape[-1] >= length:
            y = y[..., :length]
        else:
            pad = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, pad)
    return y


def magphase(S: jax.Array):
    """Split a complex spectrogram into (magnitude, unit-phase complex).

    ``librosa.magphase`` semantics (reference data.py:80,101): phase of a zero
    bin is 1+0j.
    """
    mag = jnp.abs(S)
    phase = jnp.exp(1j * jnp.angle(S)).astype(jnp.complex64)
    return mag, phase


def polar(mag: jax.Array, angle: jax.Array) -> jax.Array:
    """``torch.polar`` equivalent: mag * exp(i * angle) (reference train.py:44)."""
    return (mag * jnp.cos(angle) + 1j * mag * jnp.sin(angle)).astype(jnp.complex64)


def amplitude_to_db(
    S: jax.Array | np.ndarray,
    ref: float = 1.0,
    amin: float = 1e-5,
    top_db: Optional[float] = 80.0,
):
    """``librosa.amplitude_to_db`` semantics (used by the reference visualizer,
    aaa.py:106-108)."""
    mag = jnp.abs(S)
    db = 20.0 * jnp.log10(jnp.maximum(amin, mag)) - 20.0 * jnp.log10(
        jnp.maximum(amin, ref)
    )
    if top_db is not None:
        db = jnp.maximum(db, db.max() - top_db)
    return db


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def stft_magphase_jit(y: jax.Array, n_fft: int, hop_length: int):
    """Fused jitted STFT + magnitude/phase split for the preprocessing path
    (replaces reference data.py:79-80's host librosa calls).

    The unit phase is returned as a stacked (2, F, T) float32 real/imag pair:
    some TPU runtimes (the axon tunnel here) cannot transfer complex64 across
    the host boundary, and float planes are cheaper anyway.
    """
    S = stft(y, n_fft=n_fft, hop_length=hop_length)
    mag, phase = magphase(S)
    phase_ri = jnp.stack([jnp.real(phase), jnp.imag(phase)])
    return mag.astype(jnp.float32), phase_ri.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def istft_ri_jit(spec_ri: jax.Array, n_fft: int, hop_length: int):
    """Jitted iSTFT taking the spectrogram as stacked (2, F, T) float32
    real/imag planes (complex never crosses the host boundary).

    No ``length`` here on purpose: a per-song length would be a fresh jit
    signature per song (minutes each on remote-compile rigs) — callers slice
    the full hop*(T-1) output on the host instead."""
    S = (spec_ri[0] + 1j * spec_ri[1]).astype(jnp.complex64)
    return istft(S, hop_length=hop_length, win_length=n_fft, n_fft=n_fft)
