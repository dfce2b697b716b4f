"""Data layer tests: WAV I/O, resampling, to_spec/to_wave contract, sampler."""

import os

import numpy as np
import pytest

from svs_tpu.data import prep, wav as wavio
from svs_tpu.data.dataset import PatchDataset

SR = 8192


def _sine(sr=SR, secs=2.0, f=440.0, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


@pytest.mark.parametrize("subtype", ["PCM_16", "FLOAT"])
def test_wav_roundtrip_mono(tmp_path, subtype):
    y = _sine()
    p = str(tmp_path / "a.wav")
    wavio.write_wav(p, y, SR, subtype=subtype)
    y2, sr2 = wavio.read_wav(p)
    assert sr2 == SR and y2.shape == y.shape
    tol = 1e-4 if subtype == "PCM_16" else 1e-7
    np.testing.assert_allclose(y2, y, atol=tol)


def test_wav_stereo_and_mono_mixdown(tmp_path):
    y = np.stack([_sine(f=440), _sine(f=880)])
    p = str(tmp_path / "s.wav")
    wavio.write_wav(p, y, SR)
    y2, sr = wavio.load_audio(p, mono=True)
    np.testing.assert_allclose(y2, y.mean(0), atol=1e-4)


def test_wav_pcm24(tmp_path):
    """24-bit PCM is what MUSDB18-HQ ships."""
    import struct
    y = _sine(secs=0.1)
    i = np.clip((y * 8388608.0), -8388608, 8388607).astype(np.int32)
    b = np.zeros((len(i), 3), np.uint8)
    b[:, 0] = i & 0xFF
    b[:, 1] = (i >> 8) & 0xFF
    b[:, 2] = (i >> 16) & 0xFF
    payload = b.tobytes()
    p = str(tmp_path / "p24.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, SR, SR * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    y2, sr = wavio.read_wav(p)
    assert sr == SR
    np.testing.assert_allclose(y2, y, atol=2e-7)


def test_resample_downsamples_tone():
    sr_hi = 44100
    y = _sine(sr=sr_hi, secs=1.0, f=1000.0)
    out = wavio.resample(y, sr_hi, SR)
    assert len(out) == int(np.ceil(len(y) * SR / sr_hi))
    # a 1 kHz tone survives; spectrum peak lands on the right bin
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * SR / len(out)
    assert abs(peak_hz - 1000.0) < 10.0


def _make_song_dir(tmp_path, n_songs=2, secs=3.0):
    src = tmp_path / "src"
    for i in range(n_songs):
        d = src / f"song{i}"
        os.makedirs(d)
        mix = _sine(secs=secs, f=300 + 100 * i) + _sine(secs=secs, f=1000)
        voc = _sine(secs=secs, f=1000)
        wavio.write_wav(str(d / "mixture.wav"), mix * 0.4, SR)
        wavio.write_wav(str(d / "vocals.wav"), voc * 0.4, SR)
    return str(src)


def test_to_spec_contract(tmp_path):
    src = _make_song_dir(tmp_path)
    tar = str(tmp_path / "spec")
    n = prep.to_spec(src, tar, win_size=1024, hop_size=768, sr=SR,
                     progress=False)
    assert n == 2
    for folder in ("mixture", "vocal"):
        files = sorted(os.listdir(os.path.join(tar, folder)))
        assert files == [
            "0000_song0_phase.npy", "0000_song0_spec.npy",
            "0001_song1_phase.npy", "0001_song1_spec.npy",
        ]
    mag = np.load(os.path.join(tar, "mixture", "0000_song0_spec.npy"))
    phase = np.load(os.path.join(tar, "mixture", "0000_song0_phase.npy"))
    t_expected = 1 + (3 * SR) // 768
    assert mag.shape == (513, t_expected) and mag.dtype == np.float32
    assert phase.shape == mag.shape and phase.dtype == np.complex64
    # normalisation: mixture magnitude divided by its own max -> max == 1
    np.testing.assert_allclose(mag.max(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.abs(phase), 1.0, atol=1e-5)  # unit phase
    voc = np.load(os.path.join(tar, "vocal", "0000_song0_spec.npy"))
    assert voc.shape == mag.shape and voc.max() <= 1.0 + 1e-6


def test_to_wave_roundtrip(tmp_path):
    src = _make_song_dir(tmp_path, n_songs=1)
    tar = str(tmp_path / "spec")
    prep.to_spec(src, tar, win_size=1024, hop_size=768, sr=SR, progress=False)
    out = str(tmp_path / "wav_out")
    n = prep.to_wave(os.path.join(tar, "mixture"), out, tar,
                     win_size=1024, hop_size=768, sr=SR, progress=False)
    assert n == 1
    y, sr = wavio.read_wav(os.path.join(out, "0000_song0.wav"))
    assert sr == SR
    orig, _ = wavio.load_audio(os.path.join(src, "song0", "mixture.wav"))
    m = min(len(y), len(orig))
    # reconstruction is peak-normalised to 0.9 (reference data.py:162-164);
    # compare up to that scale
    a, b = y[:m], orig[:m]
    scale = np.dot(a, b) / np.dot(b, b)
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert corr > 0.999
    np.testing.assert_allclose(np.abs(a).max(), 0.9, atol=1e-3)


def test_to_wave_random_phase_fallback(tmp_path):
    spec_dir = tmp_path / "specs"
    os.makedirs(spec_dir)
    np.save(str(spec_dir / "0000_x_spec.npy"),
            np.random.default_rng(0).random((513, 40)).astype(np.float32))
    out = str(tmp_path / "o")
    n = prep.to_wave(str(spec_dir), out, str(tmp_path / "nophase"),
                     win_size=1024, hop_size=768, sr=SR, progress=False,
                     seed=0)
    assert n == 1 and os.path.exists(os.path.join(out, "0000_x.wav"))


def _make_spec_dataset(tmp_path, n_songs=3, t=200):
    rng = np.random.default_rng(0)
    root = tmp_path / "ds"
    for folder in ("mixture", "vocal"):
        os.makedirs(root / folder)
    for i in range(n_songs):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(str(root / folder / f"{base}_spec.npy"),
                    rng.random((513, t)).astype(np.float32))
            ang = rng.random((513, t)).astype(np.float32) * 6 - 3
            np.save(str(root / folder / f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))
    return str(root)


def test_patch_dataset_semantics(tmp_path):
    root = _make_spec_dataset(tmp_path)
    ds = PatchDataset(root, samples_per_song=4, input_len=128)
    assert len(ds) == 12 and ds.n_songs == 3
    rng = np.random.default_rng(1)
    mix, voc, mix_a, voc_a = ds.sample(0, rng)
    assert mix.shape == voc.shape == mix_a.shape == voc_a.shape == (512, 128)
    assert mix.dtype == np.float32 and mix_a.dtype == np.float32
    assert np.abs(mix_a).max() <= np.pi + 1e-5  # angles, not complex


def test_patch_dataset_pad_short_song(tmp_path):
    root = _make_spec_dataset(tmp_path, n_songs=1, t=50)
    ds = PatchDataset(root, samples_per_song=1, input_len=128)
    mix, *_ = ds.sample(0, np.random.default_rng(0))
    assert mix.shape == (512, 128)
    assert (mix[:, 50:] == 0).all()  # zero-padded tail (train.py:127-135)


def test_patch_dataset_batches(tmp_path):
    root = _make_spec_dataset(tmp_path)
    ds = PatchDataset(root, samples_per_song=4, input_len=128)
    batches = list(ds.batches(batch_size=5, seed=0))
    assert len(batches) == ds.steps_per_epoch(5) == 3
    assert batches[0]["mix"].shape == (5, 512, 128)
    assert batches[-1]["mix"].shape == (2, 512, 128)  # remainder kept
    # deterministic under the same seed
    again = list(ds.batches(batch_size=5, seed=0))
    np.testing.assert_array_equal(batches[0]["mix"], again[0]["mix"])


def test_batches_propagates_loader_errors(tmp_path):
    """A corrupted song must raise in the consumer, not silently truncate
    the epoch."""
    root = _make_spec_dataset(tmp_path, n_songs=2)
    # corrupt one phase file after discovery
    ds = PatchDataset(root, samples_per_song=2, input_len=128,
                      backend="numpy")
    victim = os.path.join(root, "mixture", "0001_s1_phase.npy")
    with open(victim, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(Exception):
        list(ds.batches(batch_size=2, seed=0))


def test_wav_reader_malformed_inputs(tmp_path):
    """Malformed RIFF files fail with clean ValueErrors; sloppy-but-decodable
    ones (lying chunk sizes, leading LIST chunks) are tolerated."""
    import struct

    def w(name, content):
        p = str(tmp_path / name)
        open(p, "wb").write(content)
        return p

    fmt16 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, SR, SR * 2, 2, 16)
    for name, content in {
        "empty.wav": b"",
        "short.wav": b"RIFF",
        "notriff.wav": b"ABCD" + b"\x00" * 100,
        "nodata.wav": b"RIFF" + struct.pack("<I", 40) + b"WAVE" + fmt16,
        "shortfmt.wav": b"RIFF" + struct.pack("<I", 60) + b"WAVE"
            + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
            + b"data" + struct.pack("<I", 2) + b"\x00\x00",
    }.items():
        with pytest.raises(ValueError):
            wavio.read_wav(w(name, content))

    # lying data size clamps to EOF
    p = w("lying.wav", b"RIFF" + struct.pack("<I", 100) + b"WAVE" + fmt16
          + b"data" + struct.pack("<I", 99999) + b"\x00\x00" * 4)
    y, sr = wavio.read_wav(p)
    assert len(y) == 4 and sr == SR

    # unknown leading chunk is skipped
    p = w("list.wav", b"RIFF" + struct.pack("<I", 200) + b"WAVE"
          + b"LIST" + struct.pack("<I", 4) + b"INFO" + fmt16
          + b"data" + struct.pack("<I", 4) + b"\x00\x01\x00\x02")
    y, sr = wavio.read_wav(p)
    assert len(y) == 2 and sr == SR
