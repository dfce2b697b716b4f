"""wav <-> spectrogram preprocessing (on-device STFT).

Reproduces the reference's on-disk contract exactly (reference data.py:46-169):

to_spec (data.py:46-112):
  <tar>/{mixture,vocal}/<idx:04d>_<song>_{spec,phase}.npy
  - spec: float32 magnitude (n_fft//2+1, T), every track divided by the
    MIXTURE's max magnitude (zero-guarded)            (data.py:84-85,105)
  - phase: complex64 unit phase                       (data.py:80,101)
  - vocals length-aligned to the mixture (truncate / zero-pad) (data.py:97-98)

to_wave (data.py:117-169):
  masked magnitude + phase (searched flat, then in a mixture/ subdir; random
  phase fallback) -> iSTFT -> peak-normalise to 0.9 -> PCM16 wav.

Unlike the reference (host librosa, serial C FFTs), the STFT/iSTFT run on the
TPU through svs_tpu.ops.stft; song lengths are bucketed to bounded padded
sizes so XLA compiles a handful of shapes, then sliced to the exact frame
count — values are identical to the unpadded transform because framing is
local and the tail frames are discarded.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svs_tpu.data import wav as wavio
from svs_tpu.ops import stft as dsp
from svs_tpu.utils.config import num2str

# wav filename -> target folder (reference data.py:41-44)
TRACK_MAP = {"mixture.wav": "mixture", "vocals.wav": "vocal"}

_BUCKET = 1 << 18  # 262144 samples (= 32 s @ 8192 Hz) padding granularity


def _bucket_pad(y: np.ndarray) -> np.ndarray:
    n = ((y.shape[-1] + _BUCKET - 1) // _BUCKET) * _BUCKET
    return np.pad(y, (0, n - y.shape[-1]))


# preprocessing STFT backend: 'auto' routes to the fused Pallas framing+DFT+
# magphase kernel on TPU (north-star "librosa preprocessing becomes a fused
# Pallas FFT + framing kernel") and the XLA FFT path elsewhere; 'xla' forces
# the exact-FFT path, 'pallas' forces the kernel (interpret mode off-TPU).
# Equivalence between the two is pinned in tests/test_pallas.py.
STFT_IMPL = os.environ.get("SVS_TPU_PREP_STFT", "auto")


def stft_magphase(y: np.ndarray, n_fft: int, hop: int,
                  impl: Optional[str] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """On-device STFT + magphase of an arbitrary-length host signal, with
    length-bucketed compilation; exact librosa frame count (1 + T//hop).

    complex64 never crosses the host boundary (unsupported on some TPU
    runtimes): the device returns f32 real/imag planes, combined here.
    """
    impl = impl or STFT_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    n_frames = 1 + len(y) // hop  # librosa center=True frame count
    yj = jnp.asarray(_bucket_pad(y))
    if impl == "pallas":
        from svs_tpu.ops.pallas import dsp as pdsp
        mag, phase_ri = pdsp.stft_magphase(
            yj, n_fft=n_fft, hop_length=hop,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        mag, phase_ri = dsp.stft_magphase_jit(yj, n_fft=n_fft, hop_length=hop)
    mag = np.asarray(mag)[:, :n_frames]
    ri = np.asarray(phase_ri)[:, :, :n_frames]
    return mag, (ri[0] + 1j * ri[1]).astype(np.complex64)


def istft_device(spec: np.ndarray, n_fft: int, hop: int,
                 length: Optional[int] = None) -> np.ndarray:
    """On-device iSTFT of a host complex spectrogram (data.py:159
    equivalent); ships f32 real/imag planes, not complex.  The length slice
    happens on the host so song lengths don't multiply jit signatures."""
    ri = np.stack([spec.real, spec.imag]).astype(np.float32)
    y = np.asarray(dsp.istft_ri_jit(jnp.asarray(ri), n_fft=n_fft,
                                    hop_length=hop))
    if length is not None:
        if y.shape[-1] >= length:
            y = y[..., :length]
        else:
            y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
    return y


def song_to_spec(
    song_path: str,
    tar: str,
    idx: int,
    song_name: str,
    *,
    win_size: int,
    hop_size: int,
    sr: int,
) -> bool:
    """Process one song folder (reference data.py:66-109). Returns True if
    the mixture existed and specs were written."""
    mix_path = os.path.join(song_path, "mixture.wav")
    if not os.path.exists(mix_path):
        return False

    y_mix, _ = wavio.load_audio(mix_path, sr=sr, mono=True)
    # one pass yields norm AND the mixture's spec/phase — the reference
    # recomputes the mixture STFT in its track loop (data.py:100), which
    # would be a second device round trip here
    mag_mix, phase_mix = stft_magphase(y_mix, win_size, hop_size)
    norm = float(mag_mix.max())
    if norm == 0:
        norm = 1.0  # zero-guard (data.py:85)

    for wav_file, folder in TRACK_MAP.items():
        track_path = os.path.join(song_path, wav_file)
        if not os.path.exists(track_path):
            continue
        if wav_file == "mixture.wav":
            mag, phase = mag_mix, phase_mix
        else:
            y, _ = wavio.load_audio(track_path, sr=sr, mono=True)
            # length-align to the mixture (data.py:97-98)
            if len(y) > len(y_mix):
                y = y[: len(y_mix)]
            else:
                y = np.pad(y, (0, len(y_mix) - len(y)))
            mag, phase = stft_magphase(y, win_size, hop_size)
        mag = (mag / norm).astype(np.float32)
        base = f"{num2str(idx)}_{song_name}"
        np.save(os.path.join(tar, folder, f"{base}_spec.npy"), mag)
        np.save(os.path.join(tar, folder, f"{base}_phase.npy"), phase)
    return True


def to_spec(src: str, tar: str, *, win_size: int, hop_size: int, sr: int,
            progress: bool = True) -> int:
    """Directory-level to_spec (reference data.py:46-112)."""
    os.makedirs(tar, exist_ok=True)
    for folder in TRACK_MAP.values():
        os.makedirs(os.path.join(tar, folder), exist_ok=True)
    songs = sorted(
        d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d))
    )
    done = 0
    it: Iterable = songs
    if progress:
        from tqdm import tqdm
        it = tqdm(songs, desc="to_spec")
    for idx, name in enumerate(it):
        try:
            done += song_to_spec(
                os.path.join(src, name), tar, idx, name,
                win_size=win_size, hop_size=hop_size, sr=sr,
            )
        except Exception as e:  # per-song resilience (data.py:111-112)
            print(f"Error processing {name}: {e}")
    return done


def find_phase(phase_dir: str, spec_name: str) -> Optional[np.ndarray]:
    """Phase search order of reference data.py:132-143: flat dir, then a
    mixture/ subdir."""
    phase_name = spec_name.replace("_spec.npy", "_phase.npy")
    for p in (
        os.path.join(phase_dir, phase_name),
        os.path.join(phase_dir, "mixture", phase_name),
    ):
        if os.path.exists(p):
            return np.load(p)
    return None


def to_wave(src: str, tar: str, phase_dir: str, *, win_size: int,
            hop_size: int, sr: int, progress: bool = True,
            seed: Optional[int] = None) -> int:
    """Directory-level to_wave (reference data.py:117-169)."""
    os.makedirs(tar, exist_ok=True)
    files = sorted(f for f in os.listdir(src) if f.endswith("_spec.npy"))
    rng = np.random.default_rng(seed)
    it: Iterable = files
    if progress:
        from tqdm import tqdm
        it = tqdm(files, desc="to_wave")
    done = 0
    for spec_name in it:
        try:
            mag = np.load(os.path.join(src, spec_name))
            phase = find_phase(phase_dir, spec_name)
            if phase is None:
                # random-phase fallback (data.py:145-148)
                phase = np.exp(2j * np.pi * rng.random(mag.shape)).astype(
                    np.complex64
                )
            min_len = min(mag.shape[1], phase.shape[1])
            spec = mag[:, :min_len] * phase[:, :min_len]
            y = istft_device(_pad_spec_frames(spec), win_size, hop_size,
                             length=hop_size * (min_len - 1))
            peak = float(np.max(np.abs(y)))
            if peak > 0:
                y = y / peak * 0.9  # renormalise (data.py:162-164)
            wavio.write_wav(
                os.path.join(tar, spec_name.replace("_spec.npy", ".wav")),
                y, sr,
            )
            done += 1
        except Exception as e:  # per-file resilience (data.py:168-169)
            print(f"Failed to reconstruct {spec_name}: {e}")
    return done


_FRAME_BUCKET = 256


def _pad_spec_frames(spec: np.ndarray) -> np.ndarray:
    """Pad the time axis to a bucket multiple so istft compiles O(1) shapes;
    the iSTFT result is sliced back via its length= argument."""
    t = spec.shape[-1]
    n = ((t + _FRAME_BUCKET - 1) // _FRAME_BUCKET) * _FRAME_BUCKET
    return np.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, n - t)])
