"""ctypes bindings + on-demand build of the native data-loading runtime
(native/svs_native.cpp).

Falls back gracefully: :func:`available` is False when no compiler/artifact
exists, and every caller (PatchDataset, wav loading) has a pure-numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsvs_native.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "svs_native.cpp"))

_lib = None
_lib_lock = threading.Lock()
_ABI = 2


def _build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO_PATH, _SRC_PATH, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            if not _build() and not os.path.exists(_SO_PATH):
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.svs_open_npy.argtypes = [ctypes.c_char_p]
        lib.svs_open_npy.restype = ctypes.c_int
        lib.svs_npy_info.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
        lib.svs_close_npy.argtypes = [ctypes.c_int]
        lib.svs_fill_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.svs_fill_batch.restype = ctypes.c_int
        lib.svs_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.svs_wav_info.restype = ctypes.c_int
        lib.svs_read_wav_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int]
        lib.svs_read_wav_f32.restype = ctypes.c_int
        lib.svs_native_abi_version.restype = ctypes.c_int
        if lib.svs_native_abi_version() != _ABI:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NpyHandle:
    """mmap'd .npy file owned by the native registry."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.handle = lib.svs_open_npy(path.encode())
        if self.handle < 0:
            raise OSError(f"svs_open_npy({path}) failed: {self.handle}")
        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        dt = ctypes.c_int()
        lib.svs_npy_info(self.handle, ctypes.byref(rows), ctypes.byref(cols),
                         ctypes.byref(dt))
        self.rows, self.cols = rows.value, cols.value
        self.dtype = "f4" if dt.value == 0 else "c8"

    def close(self):
        if self.handle >= 0:
            self._lib.svs_close_npy(self.handle)
            self.handle = -1

    def __del__(self):  # registry cleanup on GC
        try:
            self.close()
        except Exception:
            pass


def fill_batch(
    mag_handles: np.ndarray,
    phase_handles: Optional[np.ndarray],
    starts: np.ndarray,
    *,
    drop_dc: bool,
    out_len: int,
    rows: int,
    n_threads: int = 4,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Assemble (B, rows, out_len) magnitude (+ phase-angle) batch buffers
    from native handles; crop/pad (and atan2f when angles are requested) in
    C++ threads.  ``phase_handles=None`` fills magnitudes only and returns
    ``(mag, None)`` — the production dataset path, which takes angles from
    its shared per-song cache instead so every backend is bit-identical."""
    lib = _load()
    b = len(mag_handles)
    mag = np.empty((b, rows, out_len), np.float32)
    ang = (np.empty((b, rows, out_len), np.float32)
           if phase_handles is not None else None)
    rc = lib.svs_fill_batch(
        np.ascontiguousarray(mag_handles, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int)),
        (np.ascontiguousarray(phase_handles, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int))
         if phase_handles is not None else None),
        np.ascontiguousarray(starts, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        b, 1 if drop_dc else 0, out_len,
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        (ang.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
         if ang is not None else None),
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"svs_fill_batch failed: {rc}")
    return mag, ang


def read_wav(path: str, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Native WAV decode -> (float32 (T,) or (C,T), sr)."""
    lib = _load()
    frames = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.svs_wav_info(path.encode(), ctypes.byref(frames),
                          ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise OSError(f"svs_wav_info({path}) failed: {rc}")
    n = frames.value if mono else frames.value * ch.value
    out = np.empty(n, np.float32)
    rc = lib.svs_read_wav_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, 1 if mono else 0)
    if rc != 0:
        raise OSError(f"svs_read_wav_f32({path}) failed: {rc}")
    if not mono and ch.value > 1:
        out = out.reshape(frames.value, ch.value).T.copy()
    return out, sr.value
