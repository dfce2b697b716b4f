"""Native (C++) data-loader tests: build, parity with the numpy backend."""

import os

import numpy as np
import pytest

from svs_tpu.data import native, wav as wavio
from svs_tpu.data.dataset import PatchDataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)")


def _make_spec_dataset(root, n_songs=3, t=200, seed=0):
    rng = np.random.default_rng(seed)
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(root, folder), exist_ok=True)
    for i in range(n_songs):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(os.path.join(root, folder, f"{base}_spec.npy"),
                    rng.random((513, t)).astype(np.float32))
            ang = rng.random((513, t)).astype(np.float32) * 6 - 3
            np.save(os.path.join(root, folder, f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))
    return str(root)


def test_npy_handle_info(tmp_path):
    p = str(tmp_path / "a.npy")
    np.save(p, np.arange(12, dtype=np.float32).reshape(3, 4))
    h = native.NpyHandle(p)
    assert (h.rows, h.cols, h.dtype) == (3, 4, "f4")
    h.close()


def test_npy_open_missing_fails(tmp_path):
    with pytest.raises(OSError):
        native.NpyHandle(str(tmp_path / "nope.npy"))


def test_native_batch_matches_numpy(tmp_path):
    root = _make_spec_dataset(tmp_path / "ds")
    ds_np = PatchDataset(root, samples_per_song=4, backend="numpy")
    ds_nat = PatchDataset(root, samples_per_song=4, backend="native")
    assert ds_nat.backend == "native"
    a = list(ds_np.batches(batch_size=5, seed=7))
    b = list(ds_nat.batches(batch_size=5, seed=7))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for k in ("mix", "voc", "mix_angle", "voc_angle"):
            # exact, not atol: magnitudes are memcpy either way, and angles
            # come from the SAME per-song cache in both backends
            np.testing.assert_array_equal(bb[k], ba[k], err_msg=k)


def test_native_pad_short_song(tmp_path):
    root = _make_spec_dataset(tmp_path / "short", n_songs=1, t=50)
    ds = PatchDataset(root, samples_per_song=1, backend="native")
    batch = next(iter(ds.batches(batch_size=1, seed=0)))
    assert batch["mix"].shape == (1, 512, 128)
    assert (batch["mix"][0, :, 50:] == 0).all()
    assert (batch["mix_angle"][0, :, 50:] == 0).all()


def test_native_wav_parity(tmp_path, rng):
    y = np.stack([
        (rng.standard_normal(5000) * 0.3).astype(np.float32),
        (rng.standard_normal(5000) * 0.3).astype(np.float32)])
    p = str(tmp_path / "s.wav")
    wavio.write_wav(p, y, 8192)
    ours, sr = native.read_wav(p, mono=True)
    theirs, sr2 = wavio.load_audio(p, mono=True)
    assert sr == sr2 == 8192
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    st, sr3 = native.read_wav(p, mono=False)
    assert st.shape == (2, 5000)


def test_native_wav_float_subtype(tmp_path, rng):
    y = (rng.standard_normal(3000) * 0.3).astype(np.float32)
    p = str(tmp_path / "f.wav")
    wavio.write_wav(p, y, 8192, subtype="FLOAT")
    ours, _ = native.read_wav(p)
    np.testing.assert_allclose(ours, y, atol=1e-7)


def test_npy_unsupported_dtype_rejected(tmp_path):
    p = str(tmp_path / "f8.npy")
    np.save(p, np.zeros((3, 4), np.float64))
    with pytest.raises(OSError):
        native.NpyHandle(p)
