"""Time-axis-sharded whole-song U-Net inference with halo exchange.

The reference handles long songs by cutting them into independent 128-frame
segments (inference.py:75-120) — each segment sees zero temporal context from
its neighbours, which leaves audible seams at segment boundaries.  Because
the U-Net is fully convolutional in time (SURVEY.md §5), the TPU-idiomatic
alternative runs the WHOLE song as one patch with the time axis sharded
across the mesh: every conv level exchanges a small halo with its neighbours
over ICI (``lax.ppermute``), so the sharded result is BIT-IDENTICAL to
running the unsharded model over the full song on one giant chip — songs
larger than a single chip's HBM scale across the slice.

Halo arithmetic for this architecture (kernel 5, stride 2, pad 2; transposed
kernel 5, stride 2, pad 2, output_padding 1):
- down conv:  halo 2 each side, then VALID conv on the extended time axis
  ((T_loc+4-5)//2+1 = T_loc/2 outputs, first window centred on the shard's
  first owned column)
- up conv:    halo 1 each side, lhs_dilation 2, time padding (0, 1)
  (the extra right position is the zero between dilated samples)
``ppermute`` zero-fills shards with no neighbour, which reproduces the
unsharded op's zero padding at the song edges.

Constraint: local time length must survive 6 halvings, so the padded song
length is a multiple of 64 * n_devices frames.

Inference-mode only (BatchNorm running stats; dropout off) — matching how
the reference uses the model on full songs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from svs_tpu.models import unet
from svs_tpu.utils.config import SVSConfig

_DN = ("NHWC", "HWIO", "NHWC")


def _halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Concatenate each shard's time axis with `halo` columns from both
    neighbours (zeros at the slice edges).  x: (B, F, T_loc, C)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        pad = [(0, 0), (0, 0), (halo, halo), (0, 0)]
        return jnp.pad(x, pad)
    from_left = jax.lax.ppermute(
        x[:, :, -halo:, :], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(
        x[:, :, :halo, :], axis_name, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, x, from_right], axis=2)


def _bn_eval(x, p, s, eps):
    inv = jax.lax.rsqrt(s["var"] + eps) * p["scale"]
    return (x - s["mean"]) * inv + p["bias"]


def _sharded_forward(params, bn_state, mix, cfg: SVSConfig, axis_name: str):
    """Eval-mode U-Net forward on a time shard (B, F, T_loc) -> mask."""
    cdtype = jnp.dtype(cfg.compute_dtype)
    x = mix[..., None].astype(jnp.float32)

    skips = []
    for p, s in zip(params["enc"], bn_state["enc"]):
        xh = _halo_exchange(x, 2, axis_name)
        # same rounding as unet._conv (output in compute_dtype, then f32) so
        # sharded == unsharded holds bit-wise in bfloat16 mode too
        x = jax.lax.conv_general_dilated(
            xh.astype(cdtype), p["w"].astype(cdtype),
            window_strides=(2, 2), padding=((2, 2), (0, 0)),
            dimension_numbers=_DN,
        ).astype(jnp.float32) + p["b"]
        x = _bn_eval(x, p, s, cfg.bn_eps)
        x = jnp.where(x >= 0, x, cfg.leaky_slope * x)
        skips.append(x)

    for i, p in enumerate(params["dec"]):
        inp = skips[5] if i == 0 else jnp.concatenate([x, skips[5 - i]],
                                                      axis=-1)
        ih = _halo_exchange(inp, 1, axis_name)
        x = jax.lax.conv_general_dilated(
            ih.astype(cdtype), p["w"].astype(cdtype),
            window_strides=(1, 1), padding=((2, 3), (0, 1)),
            lhs_dilation=(2, 2), dimension_numbers=_DN,
        ).astype(jnp.float32) + p["b"]
        if i < 5:
            s = bn_state["dec"][i]
            x = _bn_eval(x, p, s, cfg.bn_eps)
            x = jnp.maximum(x, 0.0)

    return jax.nn.sigmoid(x)[..., 0].astype(jnp.float32)


@functools.lru_cache(maxsize=32)
def make_time_sharded_apply(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    axis_name: str = "data",
):
    """Jitted ``fn(params, bn_state, mix (B, F, T))`` with T sharded across
    the mesh; result equals the unsharded whole-patch forward.

    lru_cached so repeated calls (e.g. per song) reuse the jit cache instead
    of building a fresh shard_map wrapper — jax.jit caches by function
    identity."""
    cfg = cfg or SVSConfig()

    fwd = shard_map(
        functools.partial(_sharded_forward, cfg=cfg, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(), P(), P(None, None, axis_name)),
        out_specs=P(None, None, axis_name),
    )
    return jax.jit(fwd)


def separate_magnitude_time_sharded(
    params,
    bn_state,
    mag: np.ndarray,
    mesh: Mesh,
    *,
    vocal_solo: bool = True,
    cfg: Optional[SVSConfig] = None,
    axis_name: str = "data",
) -> np.ndarray:
    """(513, T) normalised magnitude -> masked magnitude using the
    time-sharded whole-song forward (full temporal context, no segment
    seams; contrast reference inference.py:75-120)."""
    cfg = cfg or SVSConfig()
    n_dev = mesh.devices.size
    granule = 64 * n_dev
    t = mag.shape[1]
    t_pad = -(-max(t, granule) // granule) * granule
    mag_p = np.pad(mag.astype(np.float32), ((0, 0), (0, t_pad - t)))

    fn = make_time_sharded_apply(mesh, cfg, axis_name)
    mask = np.asarray(fn(params, bn_state,
                         jnp.asarray(mag_p[None, 1:])))[0]
    if not vocal_solo:
        mask = 1.0 - mask
    pred = mag_p[1:] * mask
    out = np.concatenate([np.zeros((1, t_pad), np.float32), pred])[:, :t]
    return out
