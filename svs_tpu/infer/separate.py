"""Whole-song separation (TPU decode path).

The reference runs sliding-window inference one 128-frame segment at a time at
batch 1, with a host->device->host round-trip per segment (reference
inference.py:79-116).  Here a song's spectrogram is cut into ALL its segments
at once and masked in one batched forward pass; the full wav->wav path (STFT
-> U-Net mask -> complex-spectrogram multiply -> iSTFT) is a single jitted
graph, so audio enters HBM once and leaves as separated audio (BASELINE.json
north star).

Segment semantics preserved from the reference (inference.py:65-123):
- DC bin dropped before the model, zero DC row re-added after
- non-overlapping 128-frame segments, zero-padded tail, un-padded on output
- ``vocal_solo=False`` flips the mask to 1-mask (inference.py:102)
- magnitudes are mask * input (inference.py:107)

Shapes are bucketed (segments rounded up to a multiple of 8, samples to 2^18)
so XLA compiles a handful of programs per run regardless of song lengths.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svs_tpu.models import unet
from svs_tpu.ops import stft as dsp
from svs_tpu.utils.config import SVSConfig

_SEG_BUCKET = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _mask_segments(params, bn_state, mag_nodc: jax.Array, cfg: SVSConfig
                   ) -> jax.Array:
    """Reference semantics: independent input_len windows (inference.py:
    79-116), batched.  mag_nodc (512, T), T a multiple of input_len."""
    f, t = mag_nodc.shape
    seg_len = cfg.input_len
    n_seg = t // seg_len
    segs = mag_nodc.reshape(f, n_seg, seg_len).transpose(1, 0, 2)
    mask, _ = unet.apply(params, bn_state, segs, train=False, cfg=cfg)
    return mask.transpose(1, 0, 2).reshape(f, t)


def _mask_whole(params, bn_state, mag_nodc: jax.Array, cfg: SVSConfig
                ) -> jax.Array:
    """Whole-song single-patch forward: the model is fully convolutional in
    time (SURVEY.md §5), so every frame gets full temporal context."""
    mask, _ = unet.apply(params, bn_state, mag_nodc[None], train=False,
                         cfg=cfg)
    return mask[0]


def _mask_overlap(params, bn_state, mag_nodc: jax.Array, cfg: SVSConfig
                  ) -> jax.Array:
    """50%-overlapping windows blended with a triangular crossfade.

    The reference's non-overlapping segments give frames near a boundary a
    mask computed from a window that ends right next to them (seam
    artefacts).  Windows here step input_len/2; each frame's mask blends the
    two windows that saw it.  T must be a multiple of input_len.
    """
    f, t = mag_nodc.shape
    seg = cfg.input_len
    hop = seg // 2
    # half-window pad each side so edge frames also get two full windows
    x = jnp.pad(mag_nodc, ((0, 0), (hop, hop)))
    # hop-row view: window w covers rows [w, w+2); gather-free assembly from
    # two shifted row slices (same trick as ops.stft framing)
    rows = x.reshape(f, -1, hop)                       # (F, T/hop + 2, hop)
    segs = jnp.concatenate([rows[:, :-1], rows[:, 1:]], axis=-1)
    segs = segs.transpose(1, 0, 2)                     # (n_win, F, seg)

    mask, _ = unet.apply(params, bn_state, segs, train=False, cfg=cfg)

    # triangular crossfade; the ascending half of window w and descending
    # half of window w-1 sum to exactly 1 on their shared hop of frames
    asc = (jnp.arange(hop, dtype=jnp.float32) + 0.5) / hop
    w = jnp.concatenate([asc, asc[::-1]])              # (seg,)
    weighted = mask * w[None, None, :]
    first = weighted[:, :, :hop]                       # rows [w, w+1)
    second = weighted[:, :, hop:]                      # rows [w+1, w+2)
    n_rows = t // hop + 2
    acc = jnp.zeros((n_rows, f, hop), jnp.float32)
    acc = acc.at[:-1].add(first)
    acc = acc.at[1:].add(second)
    return acc[1:-1].transpose(1, 0, 2).reshape(f, t)  # drop pad rows


_MASK_MODES = {
    "segments": _mask_segments,
    "whole": _mask_whole,
    "overlap": _mask_overlap,
}


def _mask_frames(params, bn_state, mag_nodc: jax.Array, cfg: SVSConfig,
                 vocal_solo: bool, mode: str = "segments") -> jax.Array:
    mask = _MASK_MODES[mode](params, bn_state, mag_nodc, cfg)
    if not vocal_solo:
        mask = 1.0 - mask
    return mask


@functools.partial(
    jax.jit, static_argnames=("cfg", "vocal_solo", "mode"))
def _separate_spec_jit(params, bn_state, mag, cfg: SVSConfig,
                       vocal_solo: bool, mode: str = "segments"):
    """(513, T) normalised magnitude -> (513, T) masked magnitude; DC row
    dropped before the model and re-added as zeros (inference.py:65-123)."""
    mask = _mask_frames(params, bn_state, mag[1:], cfg, vocal_solo, mode)
    pred = mag[1:] * mask
    return jnp.concatenate([jnp.zeros((1, mag.shape[1]), mag.dtype), pred])


def separate_magnitude(
    params,
    bn_state,
    mag: np.ndarray,
    *,
    vocal_solo: bool = True,
    cfg: Optional[SVSConfig] = None,
    mode: str = "segments",
) -> np.ndarray:
    """Host entry: (513, T) float32 normalised magnitude -> masked magnitude,
    any T.

    mode='segments' reproduces the reference's independent 128-frame windows
    (inference.py:75-120); mode='whole' runs the song as ONE patch for full
    temporal context; mode='overlap' blends 50%-overlapping windows with a
    triangular crossfade (smooth masks, no hard seams) — both extensions the
    fully-convolutional architecture supports natively.
    """
    cfg = cfg or SVSConfig()
    if mode not in _MASK_MODES:
        raise ValueError(f"unknown mode {mode!r}; expected one of "
                         f"{sorted(_MASK_MODES)}")
    t = mag.shape[1]
    # time padded to a bucketed multiple of input_len (all modes need
    # input_len | T; bucketing bounds the number of compiled shapes)
    n_seg = max(_cdiv(t, cfg.input_len), 1)
    n_seg_padded = _cdiv(n_seg, _SEG_BUCKET) * _SEG_BUCKET
    t_padded = n_seg_padded * cfg.input_len
    mag_p = np.pad(mag.astype(np.float32), ((0, 0), (0, t_padded - t)))
    out = _separate_spec_jit(params, bn_state, jnp.asarray(mag_p), cfg,
                             vocal_solo, mode)
    return np.asarray(out)[:, :t]


def separate_magnitude_mesh(
    params,
    bn_state,
    mag: np.ndarray,
    mesh,
    *,
    vocal_solo: bool = True,
    cfg: Optional[SVSConfig] = None,
    mode: str = "segments",
    axis_name: str = "data",
) -> np.ndarray:
    """:func:`separate_magnitude` over a device mesh — the batch/offline
    decode path when one giant song (or a catalog sweep) wants all chips.

    mode='segments'/'overlap': segment-parallel (SP) — the song's windows
    shard over the mesh's ``axis_name`` (``dp.make_sp_separate``; zero
    communication, each chip masks its own windows).  The overlap crossfade
    commutes with SP because the blend is linear in the per-window masked
    frames: sum_w tri_w*(mask_w*mag) == mag * sum_w tri_w*mask_w, the
    unsharded formula (`_mask_overlap`).  mode='whole': halo-exchange
    time-sharded forward (``parallel/halo.py`` — full temporal context).
    Output matches the unsharded :func:`separate_magnitude` per mode
    (tests/test_infer_mesh.py).
    """
    cfg = cfg or SVSConfig()
    if mode == "whole":
        from svs_tpu.parallel import halo
        return halo.separate_magnitude_time_sharded(
            params, bn_state, mag, mesh, vocal_solo=vocal_solo, cfg=cfg,
            axis_name=axis_name)
    if mode not in ("segments", "overlap"):
        raise ValueError(f"unknown mode {mode!r}; expected one of "
                         f"{sorted(_MASK_MODES)}")
    from svs_tpu.parallel import dp, mesh as mesh_lib

    t = mag.shape[1]
    seg = cfg.input_len
    nodc = mag.astype(np.float32)[1:]
    f = nodc.shape[0]
    n_seg = max(_cdiv(t, seg), 1)
    t_pad = n_seg * seg
    if mode == "segments":
        x = np.pad(nodc, ((0, 0), (0, t_pad - t)))
        segs = np.ascontiguousarray(
            x.reshape(f, n_seg, seg).transpose(1, 0, 2))
    else:  # overlap: hop-stepped windows, half-window zero pad each side
        hop = seg // 2
        x = np.pad(nodc, ((0, 0), (hop, hop + t_pad - t)))
        rows = x.reshape(f, -1, hop)                  # (F, t_pad/hop+2, hop)
        segs = np.ascontiguousarray(np.concatenate(
            [rows[:, :-1], rows[:, 1:]], axis=-1).transpose(1, 0, 2))
    n_win = len(segs)
    n_sh = int(mesh.shape[axis_name])
    # bucket the window count like the unsharded path (_SEG_BUCKET) AND pad
    # to equal shards — one compiled program per bucket, not per song
    # length.  Extra rows are zero windows whose outputs are sliced off
    # before reassembly/accumulation, so values are unchanged.
    granule = n_sh * _SEG_BUCKET // math.gcd(n_sh, _SEG_BUCKET)
    pad_rows = (-n_win) % granule
    if pad_rows:
        segs = np.concatenate(
            [segs, np.zeros((pad_rows,) + segs.shape[1:], np.float32)])

    fn = dp.make_sp_separate(mesh, cfg, vocal_solo=vocal_solo,
                             axis_name=axis_name)
    masked = np.asarray(fn(params, bn_state, jax.device_put(
        segs, mesh_lib.batch_sharded(mesh, axis_name))))[:n_win]

    if mode == "segments":
        pred = masked.transpose(1, 0, 2).reshape(f, t_pad)
    else:
        # numpy mirror of _mask_overlap's triangular accumulation, applied
        # to the already-masked frames (linearity note in the docstring)
        asc = (np.arange(hop, dtype=np.float32) + 0.5) / hop
        tri = np.concatenate([asc, asc[::-1]])
        weighted = masked * tri[None, None, :]
        acc = np.zeros((t_pad // hop + 2, f, hop), np.float32)
        acc[:-1] += weighted[:, :, :hop]
        acc[1:] += weighted[:, :, hop:]
        pred = acc[1:-1].transpose(1, 0, 2).reshape(f, t_pad)
    return np.concatenate(
        [np.zeros((1, t_pad), np.float32), pred])[:, :t]


@functools.partial(
    jax.jit, static_argnames=("cfg", "vocal_solo", "both", "mode"))
def _separate_wav_jit(params, bn_state, y, cfg: SVSConfig, vocal_solo: bool,
                      both: bool, mode: str = "segments"):
    """Padded waveform -> separated waveform(s); one XLA program.

    Uses the exact complex spectrogram (true phase, not unit-phase quantised)
    and preserves absolute scale — the reference's file-mediated pipeline
    loses the norm factor and re-normalises to 0.9 peak (data.py:156-164);
    the on-device path doesn't have to.
    """
    spec = dsp.stft(y, n_fft=cfg.window_size, hop_length=cfg.hop_size)
    mag = jnp.abs(spec)
    norm = jnp.maximum(jnp.max(mag), 1e-12)  # mixture-max norm (data.py:84-85)

    f, t = mag.shape
    seg = cfg.input_len
    t_padded = _cdiv(t, seg) * seg
    mag_in = jnp.pad(mag[1:] / norm, ((0, 0), (0, t_padded - t)))

    mask = _mask_frames(params, bn_state, mag_in, cfg, vocal_solo,
                        mode)[:, :t]
    mask = jnp.concatenate([jnp.zeros((1, t), mask.dtype), mask])  # DC row 0

    def decode(m):
        return dsp.istft(spec * m, hop_length=cfg.hop_size,
                         win_length=cfg.window_size, n_fft=cfg.window_size,
                         length=y.shape[-1])

    vocal = decode(mask)
    if both:
        # note the asymmetry with two separate vocal_solo calls: reference
        # parity zeroes the DC row of EVERY output (inference.py:123), so
        # vocal(True) + vocal(False) loses the DC bin; both=True instead
        # complements the DC-zeroed mask (accomp DC weight = 1), making
        # vocal + accomp reconstruct the input exactly
        accomp = decode(1.0 - mask)
        return vocal, accomp
    return vocal


_SAMPLE_BUCKET = 1 << 18


@functools.partial(
    jax.jit, static_argnames=("cfg", "vocal_solo", "both", "mode"))
def _separate_wav_pcm16_jit(params, bn_state, y_i16, cfg: SVSConfig,
                            vocal_solo: bool, both: bool,
                            mode: str = "segments"):
    """PCM16 variant: int16 in, int16 out.  Decode (x/32768) and re-quantise
    happen on device, halving host<->device bytes — transfers, not FLOPs, are
    the wall for tunnelled/serving deployments."""
    y = y_i16.astype(jnp.float32) / 32768.0
    out = _separate_wav_jit(params, bn_state, y, cfg, vocal_solo, both, mode)

    def q(x):
        return jnp.clip(jnp.round(x * 32768.0), -32768, 32767).astype(jnp.int16)

    return tuple(q(o) for o in out) if both else q(out)


def separate_wav_stream(
    params,
    bn_state,
    songs,
    *,
    vocal_solo: bool = True,
    cfg: Optional[SVSConfig] = None,
    pcm16: bool = False,
    mode: str = "segments",
):
    """Sustained streaming separation of many songs with software pipelining.

    JAX dispatch is asynchronous: enqueueing song i+1's host->device transfer
    and forward pass while song i's result is still copying back overlaps
    transfer with compute, so steady-state cost per song is
    max(H2D, compute, D2H) instead of their sum — the multi-song batched
    streaming config of BASELINE.json.  With ``pcm16`` the waveforms cross
    the host boundary as int16 (half the bytes); decode/quantise run on
    device.

    Args: songs — list of 1-D float32 (or int16 when pcm16) arrays.
    Returns list of vocal estimates, dtype matching the input convention.
    """
    cfg = cfg or SVSConfig()
    lengths = [len(y) for y in songs]
    pending = []
    for y in songs:
        n = len(y)
        n_pad = _cdiv(max(n, cfg.window_size), _SAMPLE_BUCKET) * _SAMPLE_BUCKET
        if pcm16:
            y_p = jax.device_put(np.pad(np.asarray(y, np.int16),
                                        (0, n_pad - n)))
            out = _separate_wav_pcm16_jit(params, bn_state, y_p, cfg,
                                          vocal_solo, False, mode)
        else:
            y_p = jax.device_put(np.pad(np.asarray(y, np.float32),
                                        (0, n_pad - n)))
            out = _separate_wav_jit(params, bn_state, y_p, cfg, vocal_solo,
                                    False, mode)
        try:
            out.copy_to_host_async()
        except Exception:
            pass  # backend without async host copies: np.asarray still works
        pending.append(out)
    return [np.asarray(o)[:n] for o, n in zip(pending, lengths)]


def separate_wav(
    params,
    bn_state,
    y: np.ndarray,
    *,
    vocal_solo: bool = True,
    both: bool = False,
    cfg: Optional[SVSConfig] = None,
    mode: str = "segments",
) -> np.ndarray | Tuple[np.ndarray, np.ndarray]:
    """Full separation of a host waveform at the configured sample rate.

    Returns the vocal estimate (or (vocal, accompaniment) with both=True),
    same length and scale as the input.  mode as in separate_magnitude.
    """
    cfg = cfg or SVSConfig()
    if mode not in _MASK_MODES:
        raise ValueError(f"unknown mode {mode!r}; expected one of "
                         f"{sorted(_MASK_MODES)}")
    n = len(y)
    n_pad = _cdiv(max(n, cfg.window_size), _SAMPLE_BUCKET) * _SAMPLE_BUCKET
    y_p = jnp.asarray(np.pad(np.asarray(y, np.float32), (0, n_pad - n)))
    out = _separate_wav_jit(params, bn_state, y_p, cfg, vocal_solo, both,
                            mode)
    if both:
        return np.asarray(out[0])[:n], np.asarray(out[1])[:n]
    return np.asarray(out)[:n]
