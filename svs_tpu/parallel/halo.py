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

TRAINING-side context parallelism (round 3, VERDICT r2 next #5): the same
halo-exchanged forward also runs in train mode — BatchNorm batch statistics
are GLOBAL (local sums psum'd over the time axis, so sharded == unsharded
sync-BN exactly), Dropout2d masks are (B, 1, 1, C) and therefore
shard-invariant by construction (same key on every shard == the unsharded
mask), and gradients flow through ``ppermute``/``all_gather`` transposes.
The loss is computed on the all-gathered mask/planes identically on every
shard with a ``pmean`` closing the graph (each shard's redundant loss gets
cotangent 1/n; the gather's reduce-scatter transpose sums them back to
exactly the unsharded gradient).  The conv tower — the HBM-heavy part at
long patch lengths — is genuinely time-sharded; the loss stage is
replicated compute (documented tradeoff; it is a minority of the step at
the fine_tune 1536-frame geometry this path targets).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
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


# --- training-side context parallelism ------------------------------------


def _bn_train_global(x, p, s, eps, momentum, axis_name, weight=None):
    """torch-semantics train-mode BatchNorm with GLOBAL batch statistics
    across the time shards: local sums are psum'd, so the normalisation and
    running-stat update equal the unsharded ``unet._batch_norm`` exactly
    (two-pass mean/variance, matching its reduction structure)."""
    x32 = x.astype(jnp.float32)
    h, w_loc = x.shape[1], x.shape[2]
    if weight is None:
        n_local = jnp.asarray(x.shape[0] * h * w_loc, jnp.float32)
        sum_local = jnp.sum(x32, axis=(0, 1, 2))
    else:
        wgt = weight[:, None, None, None]
        n_local = jnp.sum(weight) * (h * w_loc)
        sum_local = jnp.sum(wgt * x32, axis=(0, 1, 2))
    n = jax.lax.psum(n_local, axis_name)
    mean = jax.lax.psum(sum_local, axis_name) / n
    if weight is None:
        sq_local = jnp.sum((x32 - mean) ** 2, axis=(0, 1, 2))
    else:
        sq_local = jnp.sum(wgt * (x32 - mean) ** 2, axis=(0, 1, 2))
    var = jax.lax.psum(sq_local, axis_name) / n
    unbiased = var * (n / jnp.maximum(n - 1, 1))
    new_mean = (1 - momentum) * s["mean"] + momentum * mean
    new_var = (1 - momentum) * s["var"] + momentum * unbiased
    inv = jax.lax.rsqrt(var + eps)
    y = ((x - mean.astype(x.dtype)) * (inv * p["scale"]).astype(x.dtype)
         + p["bias"].astype(x.dtype))
    return y, new_mean, new_var


def _sharded_forward_train(params, bn_state, mix, rng, cfg: SVSConfig,
                           axis_name: str, weight=None):
    """Train-mode U-Net forward on a time shard (B, F, T_loc) -> (mask,
    new_bn_state).  Mirrors ``unet.apply(train=True)`` op-for-op (conv +
    bias in compute_dtype, f32 BN stats, LeakyReLU/ReLU in activation
    dtype, Dropout2d per level) with halo exchange replacing time padding
    and psum'd BN statistics replacing whole-tensor reductions."""
    cdtype = jnp.dtype(cfg.compute_dtype)
    x = mix[..., None].astype(jnp.float32)
    new_state = {"enc": [], "dec": []}
    skips = []

    def enc_level(p, s, x):
        xh = _halo_exchange(x, 2, axis_name)
        y = jax.lax.conv_general_dilated(
            xh.astype(cdtype), p["w"].astype(cdtype),
            window_strides=(2, 2), padding=((2, 2), (0, 0)),
            dimension_numbers=_DN,
        ) + p["b"].astype(cdtype)
        y, m, v = _bn_train_global(y, p, s, cfg.bn_eps, cfg.bn_momentum,
                                   axis_name, weight)
        y = jnp.where(y >= 0, y, cfg.leaky_slope * y)
        return y, m, v

    def dec_level(p, s, inp, key, last):
        ih = _halo_exchange(inp, 1, axis_name)
        y = jax.lax.conv_general_dilated(
            ih.astype(cdtype), p["w"].astype(cdtype),
            window_strides=(1, 1), padding=((2, 3), (0, 1)),
            lhs_dilation=(2, 2), dimension_numbers=_DN,
        ) + p["b"].astype(cdtype)
        if last:
            return y, None, None
        y, m, v = _bn_train_global(y, p, s, cfg.bn_eps, cfg.bn_momentum,
                                   axis_name, weight)
        y = jnp.maximum(y, 0.0)
        # Dropout2d masks are (B, 1, 1, C): broadcast over time, so the
        # same per-level key on every shard IS the unsharded mask
        y = unet._dropout2d(y, cfg.dropout_rate, key)
        return y, m, v

    if cfg.remat:
        # same tradeoff as the unsharded path (unet.py:340-345, measured at
        # the fine_tune long-patch geometry): recompute each level in the
        # backward — including its halo ppermute, which re-executes
        # symmetrically on every shard, keeping collective call counts
        # lockstep — instead of storing its activations
        enc_level = jax.checkpoint(enc_level)
        dec_level = jax.checkpoint(dec_level, static_argnums=(4,))

    for p, s in zip(params["enc"], bn_state["enc"]):
        x, m, v = enc_level(p, s, x)
        new_state["enc"].append(dict(mean=m, var=v))
        skips.append(x)

    drop_keys = jax.random.split(rng, 5)
    for i, p in enumerate(params["dec"]):
        inp = skips[5] if i == 0 else jnp.concatenate([x, skips[5 - i]],
                                                      axis=-1)
        last = i == 5
        x, m, v = dec_level(p, None if last else bn_state["dec"][i], inp,
                            None if last else drop_keys[i], last)
        if not last:
            new_state["dec"].append(dict(mean=m, var=v))

    mask = jax.nn.sigmoid(x.astype(jnp.float32))
    return mask[..., 0].astype(jnp.float32), new_state


def shard_batch_time(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch dict onto the mesh with the TIME axis (dim 2 of
    every (B, F, T) plane) sharded; the per-example ``weight`` vector (added
    as ones if absent) stays replicated.  T must be a multiple of
    64 * mesh-size (six stride-2 halvings per shard)."""
    n = mesh.devices.size
    tsh = NamedSharding(mesh, P(None, None, axis_name))
    rep = NamedSharding(mesh, P())
    out = {}
    b = t = None
    for k, v in batch.items():
        if k == "weight":
            continue
        v = np.asarray(v)
        b, t = v.shape[0], v.shape[2]
        if t % (64 * n):
            raise ValueError(
                f"time axis {t} must be a multiple of {64 * n} "
                f"(64 frames per stride-2 level x {n} shards)")
        out[k] = jax.device_put(v, tsh)
    weight = np.asarray(batch.get("weight", np.ones((b,), np.float32)))
    out["weight"] = jax.device_put(weight, rep)
    return out


from svs_tpu.data.dataset import PLANE_KEYS as _PLANE_KEYS  # noqa: E402


def make_cp_loss(mesh: Mesh, cfg: Optional[SVSConfig] = None,
                 axis_name: str = "data"):
    """The shard_map'd context-parallel loss: ``fn(params, bn_state, batch,
    rng) -> (total, (new_bn, aux))`` with batch planes time-sharded.
    Exposed separately so the gradient-parity proof can differentiate it
    directly (in f64) without the jitted optimizer around it."""
    from svs_tpu.losses.mrstft import combined_loss

    cfg = cfg or SVSConfig()

    def loss_inner(params, bn_state, batch, rng):
        weight = batch.get("weight")
        mask, new_bn = _sharded_forward_train(
            params, bn_state, batch["mix"], rng, cfg, axis_name, weight)
        gather = functools.partial(jax.lax.all_gather, axis_name=axis_name,
                                   axis=2, tiled=True)
        mask_f = gather(mask)
        full = {k: gather(batch[k]) for k in _PLANE_KEYS}
        total, aux = combined_loss(mask_f, full["mix"], full["voc"],
                                   full["mix_angle"], full["voc_angle"],
                                   cfg, weight=weight)
        # every shard computed the identical loss from gathered planes;
        # pmean keeps the value and gives each redundant computation
        # cotangent 1/n, which the gather's reduce-scatter transpose sums
        # back to exactly the unsharded gradient (no n-fold overcount)
        total = jax.lax.pmean(total, axis_name)
        aux = {k: jax.lax.pmean(v, axis_name) for k, v in aux.items()}
        return total, (new_bn, aux)

    in_specs = (P(), P(),
                {**{k: P(None, None, axis_name) for k in _PLANE_KEYS},
                 "weight": P()},
                P())
    # check_vma=False: the static varying-axes checker mis-types FFT
    # cotangents of gathered (varying-marked but numerically replicated)
    # values inside the transpose, breaking grad for mr_mag_impl='fft';
    # the collectives themselves (psum/pmean/all_gather/ppermute) are
    # unaffected and the f64 parity test proves the gradients
    return shard_map(loss_inner, mesh=mesh, in_specs=in_specs,
                     out_specs=(P(), (P(), P())), check_vma=False)


def make_cp_train_step(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    optimizer=None,
    axis_name: str = "data",
):
    """Context-parallel training: jitted ``step(state, batch, rng) ->
    (state, metrics)`` with every (B, F, T) batch plane sharded on TIME
    across the mesh (``shard_batch_time``) and state replicated.

    The long-context training path SURVEY.md §5 names: the fine_tune
    preset's 1536-frame patches (reference config.py:25-33) train with the
    conv tower's activations split across chips; gradients equal the
    unsharded step's (f64 parity ~1e-9, tests/test_halo.py).
    """
    import optax

    from svs_tpu.train.step import TrainState, make_optimizer

    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    rep = NamedSharding(mesh, P())
    tsh = NamedSharding(mesh, P(None, None, axis_name))

    shard_loss = make_cp_loss(mesh, cfg, axis_name)

    def _step(state: TrainState, batch, rng):
        grads, (new_bn, aux) = jax.grad(shard_loss, has_aux=True)(
            state.params, state.bn_state, batch, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        return TrainState(new_params, new_bn, new_opt, state.step + 1), aux

    state_shardings = TrainState(params=rep, bn_state=rep, opt_state=rep,
                                 step=rep)
    batch_shardings = {**{k: tsh for k in _PLANE_KEYS}, "weight": rep}
    return jax.jit(
        _step,
        in_shardings=(state_shardings, batch_shardings, rep),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )


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
