"""Helpers to execute the ACTUAL reference programs (/root/reference) as
subprocesses for program-vs-program parity tests.

The image lacks two of the reference's pip deps, supplied here as faithful
stand-ins so the reference's own code paths run unmodified:

- ``auraloss``: a stub implementing ``freq.MultiResolutionSTFTLoss`` with the
  auraloss default formula (fft 1024/2048/512, hop 120/240/50, win
  600/1200/240; spectral-convergence + log-magnitude L1, mean over
  resolutions) — the same formula our torch oracle in test_losses.py pins.
- the L1 crit: the shipped ``model.crit = WeightedL1Loss()`` crashes on its
  own arity bug (reference model.py:26 vs train.py:281-282); the reference's
  experiment notes say the runs used ``nn.L1Loss`` (reference config.py:33,44),
  so the harness applies exactly that documented swap before UNet() is built.

librosa/soundfile (used only by reference data.py) are not needed: both
programs consume the on-disk ``.npy`` spec contract directly, which
:func:`make_spec_dataset` synthesises with a numpy STFT.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import numpy as np

REFERENCE = "/root/reference"

# Torch preamble shared by both reference entrypoints: seeds, auraloss stub,
# documented crit swap.  {extra} is the per-entry tail.
_HARNESS = """
import os, sys, types
sys.path.insert(0, {reference!r})
import numpy as np
import torch, random
torch.manual_seed(0); random.seed(0); np.random.seed(0)

class MultiResolutionSTFTLoss(torch.nn.Module):
    '''auraloss.freq.MultiResolutionSTFTLoss defaults (see module docstring).'''
    def __init__(self, sample_rate=None, device=None, **kw):
        super().__init__()
        self.resolutions = [(1024, 120, 600), (2048, 240, 1200),
                            (512, 50, 240)]
        self.windows = [torch.hann_window(w) for _, _, w in self.resolutions]

    def forward(self, x, y):
        if x.dim() == 3:  # (B, C, T) -> (B*C, T), as real auraloss does
            x = x.reshape(-1, x.shape[-1])
            y = y.reshape(-1, y.shape[-1])
        total = 0.0
        for (n_fft, hop, win), w in zip(self.resolutions, self.windows):
            def mag(sig):
                S = torch.stft(sig, n_fft, hop, win, w.to(sig.device),
                               return_complex=True)
                return torch.sqrt(torch.clamp(S.real ** 2 + S.imag ** 2,
                                              min=1e-8))
            xm, ym = mag(x), mag(y)
            sc = torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")
            lm = torch.nn.functional.l1_loss(torch.log(xm), torch.log(ym))
            total = total + sc + lm
        return total / len(self.resolutions)

aural = types.ModuleType("auraloss")
aural.freq = types.ModuleType("auraloss.freq")
aural.freq.MultiResolutionSTFTLoss = MultiResolutionSTFTLoss
sys.modules["auraloss"] = aural
sys.modules["auraloss.freq"] = aural.freq

import model as ref_model
ref_model.WeightedL1Loss = torch.nn.L1Loss  # documented runnable path

import runpy
sys.argv = {argv!r}
runpy.run_path(os.path.join({reference!r}, {entry!r}), run_name="__main__")
"""


def _run(entry: str, argv: list, workdir: str, timeout: int = 900) -> str:
    os.makedirs(os.path.join(workdir, "CKPT"), exist_ok=True)
    os.makedirs(os.path.join(workdir, "LOG"), exist_ok=True)
    script = textwrap.dedent(_HARNESS).format(
        reference=REFERENCE, argv=[entry] + [str(a) for a in argv],
        entry=entry)
    proc = subprocess.run([sys.executable, "-c", script], cwd=workdir,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"reference {entry} failed:\n{proc.stdout}\n{proc.stderr}")
    return proc.stdout


def run_reference_train(workdir: str, train_folder: str, label: str,
                        epochs: int, batch_size: int,
                        load_path: str = "none", timeout: int = 900) -> list:
    """Execute reference train.py; returns the per-epoch train losses from
    its text log (reference train.py:313-314,384-387)."""
    _run("train.py", ["--train_folder", train_folder, "--label", label,
                      "--epoch", epochs, "--batch_size", batch_size,
                      "--load_path", load_path, "--valid_folder", "nope"],
         workdir, timeout)
    log = os.path.join(workdir, "LOG", f"log_{label}.txt")
    return [float(l) for l in open(log) if not l.startswith("Val")]


def run_reference_inference(workdir: str, model_path: str,
                            mixture_folder: str, tar: str,
                            vocal_solo: int = 1, timeout: int = 600) -> None:
    """Execute reference inference.py (sliding-window masking loop,
    reference inference.py:36-129)."""
    _run("inference.py", ["--model_path", model_path, "--tar", tar,
                          "--mixture_folder", mixture_folder,
                          "--vocal_solo", vocal_solo], workdir, timeout)


def _np_stft_mag_phase(y: np.ndarray, n_fft: int = 1024, hop: int = 768):
    """librosa-convention STFT (centered, hann, reflect pad) in plain numpy —
    independent of both torch and our jax ops."""
    pad = n_fft // 2
    yp = np.pad(y, pad, mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = yp[idx] * np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames, axis=1).T  # (513, T)
    # C-order: .T leaves these F-contiguous, and the native npy loader (and
    # a strict reading of the contract) requires fortran_order: False
    mag = np.ascontiguousarray(np.abs(spec), np.float32)
    phase = np.ascontiguousarray(np.exp(1j * np.angle(spec)), np.complex64)
    return mag, phase


def make_spec_dataset(dst: str, n_songs: int = 1, seconds: float = 20.0,
                      sr: int = 8192, seed: int = 0) -> None:
    """Synthesise tone+noise songs and write the reference's on-disk spec
    contract (<dst>/{mixture,vocal}/NNNN_<song>_{spec,phase}.npy with
    mixture-max normalisation, reference data.py:84-85,105-109)."""
    rng = np.random.default_rng(seed)
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(dst, folder), exist_ok=True)
    t = int(seconds * sr)
    for i in range(n_songs):
        freq = 220.0 * (i + 1)
        vocal = (0.3 * np.sin(2 * np.pi * freq * np.arange(t) / sr)
                 * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * np.arange(t) / sr))
                 ).astype(np.float32)
        accomp = (0.2 * rng.standard_normal(t)).astype(np.float32)
        mixture = vocal + accomp
        mix_mag, mix_phase = _np_stft_mag_phase(mixture)
        voc_mag, voc_phase = _np_stft_mag_phase(vocal)
        norm = max(mix_mag.max(), 1e-12)  # mixture-max norm (data.py:84-85)
        base = f"{i:04d}_song{i}"
        np.save(os.path.join(dst, "mixture", f"{base}_spec.npy"),
                mix_mag / norm)
        np.save(os.path.join(dst, "mixture", f"{base}_phase.npy"), mix_phase)
        np.save(os.path.join(dst, "vocal", f"{base}_spec.npy"),
                voc_mag / norm)
        np.save(os.path.join(dst, "vocal", f"{base}_phase.npy"), voc_phase)
