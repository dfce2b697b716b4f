"""Import / export of reference PyTorch checkpoints.

The reference saves checkpoints as ``{'model_state_dict': ..., 'optim': ...,
'loss_list_*': ...}`` (reference model.py:140-152) or the richer train.py dict
with ``'epoch'``/``'scheduler'`` (reference train.py:369-382).  This module
converts that state dict into svs_tpu's functional pytrees (and back), so a
pretrained reference model can be run and SDR-parity-verified on TPU
(SURVEY.md §7 stage 2).

Layout conversions:
- torch Conv2d weight (O, I, kh, kw)          -> HWIO (kh, kw, I, O)
- torch ConvTranspose2d weight (I, O, kh, kw) -> pre-flipped conv-equivalent
  HWIO kernel: K[h, w, i, o] = W[i, o, kh-1-h, kw-1-w], so the forward pass is
  a plain lhs-dilated convolution (see svs_tpu.models.unet._conv_transpose).

torch is only needed for reading ``.pth`` files; the conversion itself is
numpy-only.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from svs_tpu.models import unet


def _np(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32)


def conv_weight_to_hwio(w_oihw: np.ndarray) -> np.ndarray:
    return np.transpose(w_oihw, (2, 3, 1, 0))


def conv_weight_from_hwio(w_hwio: np.ndarray) -> np.ndarray:
    return np.transpose(w_hwio, (3, 2, 0, 1))


def deconv_weight_to_hwio(w_iohw: np.ndarray) -> np.ndarray:
    return np.transpose(w_iohw, (2, 3, 0, 1))[::-1, ::-1, :, :].copy()


def deconv_weight_from_hwio(w_hwio: np.ndarray) -> np.ndarray:
    return np.transpose(w_hwio[::-1, ::-1, :, :], (2, 3, 0, 1)).copy()


def params_from_state_dict(
    sd: Mapping[str, Any]
) -> Tuple[unet.Params, unet.State]:
    """Build (params, state) pytrees from a reference-format state dict
    (key naming from reference model.py:47-109: ``conv{i}.0/.1``,
    ``deconv{i}``, ``deconv{i}_BAD.0``)."""
    enc_p, enc_s, dec_p, dec_s = [], [], [], []
    for i in range(1, 7):
        enc_p.append(
            dict(
                w=jnp.asarray(conv_weight_to_hwio(_np(sd[f"conv{i}.0.weight"]))),
                b=jnp.asarray(_np(sd[f"conv{i}.0.bias"])),
                scale=jnp.asarray(_np(sd[f"conv{i}.1.weight"])),
                bias=jnp.asarray(_np(sd[f"conv{i}.1.bias"])),
            )
        )
        enc_s.append(
            dict(
                mean=jnp.asarray(_np(sd[f"conv{i}.1.running_mean"])),
                var=jnp.asarray(_np(sd[f"conv{i}.1.running_var"])),
            )
        )
    for i in range(1, 7):
        p = dict(
            w=jnp.asarray(deconv_weight_to_hwio(_np(sd[f"deconv{i}.weight"]))),
            b=jnp.asarray(_np(sd[f"deconv{i}.bias"])),
        )
        if i < 6:
            p["scale"] = jnp.asarray(_np(sd[f"deconv{i}_BAD.0.weight"]))
            p["bias"] = jnp.asarray(_np(sd[f"deconv{i}_BAD.0.bias"]))
            dec_s.append(
                dict(
                    mean=jnp.asarray(_np(sd[f"deconv{i}_BAD.0.running_mean"])),
                    var=jnp.asarray(_np(sd[f"deconv{i}_BAD.0.running_var"])),
                )
            )
        dec_p.append(p)
    return {"enc": enc_p, "dec": dec_p}, {"enc": enc_s, "dec": dec_s}


def params_to_state_dict(params: unet.Params, state: unet.State) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_state_dict` (reference key naming), for
    exporting TPU-trained weights back to a reference-loadable checkpoint."""
    sd: Dict[str, np.ndarray] = {}
    # torch's strict load_state_dict also expects num_batches_tracked for
    # every BN layer (only consulted when momentum=None, which the reference
    # never uses — 0 is safe)
    nbt = np.asarray(0, np.int64)
    for i, (p, s) in enumerate(zip(params["enc"], state["enc"]), start=1):
        sd[f"conv{i}.0.weight"] = conv_weight_from_hwio(np.asarray(p["w"]))
        sd[f"conv{i}.0.bias"] = np.asarray(p["b"])
        sd[f"conv{i}.1.weight"] = np.asarray(p["scale"])
        sd[f"conv{i}.1.bias"] = np.asarray(p["bias"])
        sd[f"conv{i}.1.running_mean"] = np.asarray(s["mean"])
        sd[f"conv{i}.1.running_var"] = np.asarray(s["var"])
        sd[f"conv{i}.1.num_batches_tracked"] = nbt
    for i, p in enumerate(params["dec"], start=1):
        sd[f"deconv{i}.weight"] = deconv_weight_from_hwio(np.asarray(p["w"]))
        sd[f"deconv{i}.bias"] = np.asarray(p["b"])
        if i < 6:
            s = state["dec"][i - 1]
            sd[f"deconv{i}_BAD.0.weight"] = np.asarray(p["scale"])
            sd[f"deconv{i}_BAD.0.bias"] = np.asarray(p["bias"])
            sd[f"deconv{i}_BAD.0.running_mean"] = np.asarray(s["mean"])
            sd[f"deconv{i}_BAD.0.running_var"] = np.asarray(s["var"])
            sd[f"deconv{i}_BAD.0.num_batches_tracked"] = nbt
    return sd


def load_pth(path: str) -> Tuple[unet.Params, unet.State, Dict[str, Any]]:
    """Load a reference ``.pth`` checkpoint file.

    Handles both on-disk formats (bare ``model.save`` dicts, model.py:140-152,
    and train.py's rich dicts, train.py:369-382).  Returns (params, state,
    extras) where extras carries epoch / loss histories when present.
    """
    import torch  # local import: only needed for .pth ingestion

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)

    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v for k, v in sd.items()}
    params, state = params_from_state_dict(sd)
    extras = {}
    if isinstance(ckpt, dict):
        for key in ckpt:
            if key.startswith("loss_list") or key in ("epoch",):
                extras[key] = ckpt[key]
    return params, state, extras
