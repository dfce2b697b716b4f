"""Validation-time separation quality (vocal SDR/NSDR) for the train loop.

The reference tracks only the combined loss during training (train.py:313-363)
and measures its headline metric — vocal SDR (evaluate.py:203-239) — in a
separate offline pass over reconstructed wavs.  With the whole decode path
on-device (infer/separate.py + ops/stft.py) and a jitted BSS eval
(evaluation/bss_jax.py) that offline pass is cheap enough to run DURING
training: this module decodes each validation song from its on-disk
spectrograms and scores it with the same 2-source BSS protocol the
``evaluate`` CLI uses (evaluate.py:26-84 semantics).

Scale note: prep normalises every track's magnitude by the MIXTURE's max
(data.py:84-85,105), i.e. one common factor per song across mixture and
vocal.  BSS-eval ratios are invariant under a common scaling of references
and estimates (the least-squares projections are scale-covariant), so SDR
computed from the normalised spectrograms equals SDR on the original wavs
up to the phase-reconstruction error — exactly what the offline
``to_wave -> evaluate`` chain measures too.

This is an observability extension, not a behaviour change: best-checkpoint
selection stays loss-based (reference train.py:353-355 parity); the SDR
lands in the metrics JSONL and the epoch printout.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from svs_tpu.utils.config import SVSConfig


def _load_pair(folder: str, name: str):
    spec = np.load(os.path.join(folder, name))
    phase = np.load(os.path.join(folder, name.replace("_spec.npy",
                                                      "_phase.npy")))
    min_len = min(spec.shape[1], phase.shape[1])
    return spec[:, :min_len].astype(np.float32), phase[:, :min_len]


def validation_sdr(
    params,
    bn_state,
    valid_folder: str,
    cfg: Optional[SVSConfig] = None,
    *,
    mode: str = "segments",
    impl: str = "jax",
    max_songs: Optional[int] = None,
) -> Dict[str, object]:
    """Decode every paired song under ``valid_folder/{mixture,vocal}`` and
    return mean vocal SDR/SIR/SAR/NSDR plus per-song values.

    mode: decode windowing passed to infer.separate_magnitude ('segments'
    is reference inference parity).  impl: 'jax' (device BSS eval) or
    'numpy'.  Songs whose vocal is all-silent are skipped (BSS eval is
    undefined there, matching mir_eval), as is any song that fails to
    decode — per-item resilience like the reference's loops.
    """
    from svs_tpu.data import prep
    from svs_tpu.infer.separate import separate_magnitude

    if impl == "jax":
        from svs_tpu.evaluation import bss_jax as bss
    else:
        from svs_tpu.evaluation import bss

    cfg = cfg or SVSConfig()
    mix_dir = os.path.join(valid_folder, "mixture")
    voc_dir = os.path.join(valid_folder, "vocal")
    names = sorted(f for f in os.listdir(mix_dir) if f.endswith("_spec.npy")
                   if os.path.exists(os.path.join(voc_dir, f)))
    if max_songs is not None:
        names = names[:max_songs]

    per_song: List[Dict[str, float]] = []
    skipped: List[str] = []
    for name in names:
        try:
            mix_mag, mix_phase = _load_pair(mix_dir, name)
            voc_mag, voc_phase = _load_pair(voc_dir, name)
            t = min(mix_mag.shape[1], voc_mag.shape[1])
            est_mag = separate_magnitude(params, bn_state, mix_mag[:, :t],
                                         vocal_solo=True, cfg=cfg, mode=mode)
            length = cfg.hop_size * (t - 1)  # to_wave convention (prep.py)

            def wav(spec):
                return prep.istft_device(
                    prep._pad_spec_frames(spec[:, :t]), cfg.window_size,
                    cfg.hop_size, length=length)

            est = wav(est_mag * mix_phase[:, :t])
            ref = wav(voc_mag * voc_phase[:, :t])
            mix = wav(mix_mag * mix_phase[:, :t])
            m = bss.compute_metrics_for_track(mix, ref, est)
            per_song.append({"song": name[:-len("_spec.npy")], **m})
        except Exception as e:  # noqa: BLE001 — per-item resilience
            skipped.append(f"{name}: {e}")

    out: Dict[str, object] = {"per_song": per_song, "skipped": skipped}
    for k in ("SDR", "SIR", "SAR", "NSDR"):
        vals = [s[k] for s in per_song]
        out[k] = float(np.mean(vals)) if vals else None
    return out
