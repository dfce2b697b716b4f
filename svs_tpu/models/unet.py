"""Functional U-Net mask estimator (TPU-native rebuild of reference model.py).

Architecture contract (reference model.py:42-201):

- encoder: 6 x [Conv 5x5 stride 2 pad 2 -> BatchNorm -> LeakyReLU(0.2)],
  channels 1->16->32->64->128->256->512, spatial (512,128) -> (8,2)
- decoder: 6 x ConvTranspose 5x5 stride 2 pad 2 with the output pinned to the
  mirror encoder shape (torch ``output_size=`` at model.py:183-198 — all our
  shapes double exactly, which corresponds to ``output_padding=1``, i.e.
  asymmetric (2,3) padding in the equivalent lhs-dilated convolution);
  the first five deconvs are followed by [BatchNorm -> ReLU -> Dropout2d(0.5)]
- skip connections: channel-concat [decoder_out, encoder_out] feeding the next
  deconv (model.py:186-198)
- final sigmoid -> soft mask in [0,1] (model.py:200)

Design departures from the reference (TPU-first, not a translation):

- pure functions over explicit pytrees (``init`` / ``apply``) instead of
  ``nn.Module`` with an embedded optimizer (model.py:116) — the optimizer
  lives in the train step (svs_tpu.train.step) where jax.grad needs it
- NHWC layout with HWIO kernels (XLA's native TPU conv layout); the
  (B, 1, 512, 128) NCHW patch layout of the reference is an API-edge view
- optional bfloat16 conv compute with float32 accumulation for the MXU
- BatchNorm running-stat updates are functional (state in, state out) and
  match torch semantics (momentum 0.1, unbiased running var) so imported
  reference checkpoints are bit-compatible
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from svs_tpu.utils.config import SVSConfig

Params = Dict[str, Any]
State = Dict[str, Any]

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x: jax.Array, w: jax.Array, stride: int, compute_dtype) -> jax.Array:
    # conv runs wholly in compute_dtype and its output STAYS in compute_dtype
    # (activations between levels are bf16 when cfg.compute_dtype is — halves
    # the HBM activation traffic of fwd AND bwd, the non-MXU-bound part of
    # the step).  Keeping every op in one dtype also keeps the backward convs
    # dtype-consistent (a preferred_element_type upcast would hand an f32
    # cotangent to a bf16 transpose conv, which lax rejects); the MXU
    # accumulates bf16 inputs in f32 internally either way.
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=((2, 2), (2, 2)),
        dimension_numbers=_DN,
    )


def _conv_transpose(x: jax.Array, w: jax.Array, compute_dtype) -> jax.Array:
    """Stride-2 transposed conv, kernel 5, pad 2, output_padding 1.

    Equivalent lhs-dilated convolution: dilate the input 2x and convolve with
    the (already spatially-flipped, io-transposed — see torch_import) kernel
    under (2, 3) asymmetric padding.  This reproduces torch's
    ``ConvTranspose2d(..., output_size=2*in)`` exactly (reference
    model.py:183-198).
    """
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(1, 1),
        padding=((2, 3), (2, 3)),
        lhs_dilation=(2, 2),
        dimension_numbers=_DN,
    )


# --- packed (space-to-depth) lowerings of the two edge layers -------------
#
# The first conv (1 input channel) and last deconv (1 output channel) run the
# model's largest spatial extents with almost no channels, so the 128x128 MXU
# is nearly empty there and their backward passes are lhs-dilated convs XLA
# tiles poorly; measured on v5e (B=32, f32 fwd+bwd): enc1 1.6 ms and dec6
# 3.0 ms of the 9.6 ms model total.  Packing 2x2 spatial blocks into channels
# turns both into stride-1 3x3 convs (and makes every autodiff-derived
# backward conv stride-1 too — no lhs_dilation anywhere).  The weight
# rearrangements below are exact: same taps, same sums, only the iteration
# space changes, so checkpoints are untouched and packed == direct to float
# rounding (tests/test_unet.py pins both paths against each other).


def _space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); packed channel = (row, col, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C); inverse packing of _space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def _pack_enc_kernel(w: jax.Array) -> jax.Array:
    """(5, 5, Cin, Cout) stride-2 kernel -> (3, 3, 4*Cin, Cout) stride-1
    kernel on space-to-depth input.

    Output pixel (i, j) of the stride-2 pad-2 conv reads input rows
    2i-2..2i+2 = packed rows i-1..i+1 at in-block offsets a, b with original
    tap u = 2*dp + a (dp = packed row offset + 1 in [0, 2]); tap index 5
    (dp=2, a=1) does not exist -> zero-pad the kernel to 6x6 first."""
    k, _, cin, cout = w.shape
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (6, 6, Cin, Cout)
    wp = wp.reshape(3, 2, 3, 2, cin, cout)             # [dp, a, dq, b]
    return wp.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 4 * cin, cout)


def _pack_dec_kernel(w: jax.Array) -> jax.Array:
    """(5, 5, Cin, Cout) lhs-dilated-conv kernel (the _conv_transpose form)
    -> (3, 3, Cin, 4*Cout) stride-1 kernel producing depth-to-space output.

    Output sample y[2n+alpha] of the dilation-2 pad-(2,3) conv sums taps
    u = 2*d + 2 - alpha over packed-input offsets d in [-1, 1]; with the
    kernel front-padded by 1 the index becomes 2*(d+1) + (1-alpha), so the
    (1-alpha, 1-beta) sub-kernels are read off a (3,2,3,2) reshape and the
    phase axes flipped back to (alpha, beta) order."""
    k, _, cin, cout = w.shape
    wq = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (6, 6, Cin, Cout)
    wq = wq.reshape(3, 2, 3, 2, cin, cout)             # [d, 1-alpha, e, 1-beta]
    wq = wq[:, ::-1, :, ::-1]                          # [d, alpha, e, beta]
    # -> (d, e, Cin, alpha, beta, Cout) -> (3, 3, Cin, 4*Cout)
    return wq.transpose(0, 2, 4, 1, 3, 5).reshape(3, 3, cin, 4 * cout)


def _conv_packed(x: jax.Array, w: jax.Array, compute_dtype) -> jax.Array:
    """Exact rewrite of ``_conv(stride=2)``: space-to-depth input, 3x3
    stride-1 conv with the rearranged kernel."""
    return jax.lax.conv_general_dilated(
        _space_to_depth(x.astype(compute_dtype)),
        _pack_enc_kernel(w).astype(compute_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DN,
    )


def _conv_transpose_packed(x: jax.Array, w: jax.Array,
                           compute_dtype) -> jax.Array:
    """Exact rewrite of ``_conv_transpose``: 3x3 stride-1 conv emitting the
    four output phases as channels, then depth-to-space."""
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        _pack_dec_kernel(w).astype(compute_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DN,
    )
    return _depth_to_space(y)


def _batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    *,
    train: bool,
    eps: float,
    momentum: float,
    weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """torch BatchNorm2d semantics on NHWC: normalise with per-batch biased
    variance in train mode, update running stats with unbiased variance.

    ``weight`` is an optional per-example (B,) 0/1 validity mask: batch
    statistics are then computed over real examples only, so a zero-padded
    batch (drop-free remainder policy, parallel.mesh.shard_batch) yields
    exactly the unpadded batch's statistics.

    Stats/running-state stay float32 regardless of the activation dtype (the
    reductions upcast, which XLA fuses into the reduce); the normalisation
    itself runs in the activation's dtype so bf16 activations stay bf16."""
    if train:
        axes = (0, 1, 2)
        x32 = x.astype(jnp.float32)
        if weight is None:
            batch_mean = jnp.mean(x32, axis=axes)
            batch_var = jnp.var(x32, axis=axes)
            n = x.shape[0] * x.shape[1] * x.shape[2]
        else:
            w = weight[:, None, None, None]
            n = jnp.sum(weight) * (x.shape[1] * x.shape[2])
            batch_mean = jnp.sum(w * x32, axis=axes) / n
            batch_var = jnp.sum(w * (x32 - batch_mean) ** 2, axis=axes) / n
        unbiased = batch_var * (n / jnp.maximum(n - 1, 1))
        new_mean = (1 - momentum) * mean + momentum * batch_mean
        new_var = (1 - momentum) * var + momentum * unbiased
        use_mean, use_var = batch_mean, batch_var
    else:
        new_mean, new_var = mean, var
        use_mean, use_var = mean, var
    inv = jax.lax.rsqrt(use_var + eps)
    y = ((x - use_mean.astype(x.dtype)) * (inv * scale).astype(x.dtype)
         + bias.astype(x.dtype))
    return y, new_mean, new_var


def _dropout2d(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """torch Dropout2d: drop whole channel maps, scale survivors by 1/(1-p)."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], 1, 1, x.shape[3]))
    return x * keep.astype(x.dtype) / (1.0 - rate)


def init(rng: jax.Array, cfg: Optional[SVSConfig] = None) -> Tuple[Params, State]:
    """Initialise parameters + BN state.

    Uses torch's default conv init (kaiming-uniform with a=sqrt(5), i.e.
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so that
    from-scratch training starts from the same distribution the reference did.
    """
    cfg = cfg or SVSConfig()
    k = cfg.kernel_size
    chans = (1,) + tuple(cfg.enc_channels)  # (1,16,32,64,128,256,512)

    enc_p: List[Dict[str, jax.Array]] = []
    enc_s: List[Dict[str, jax.Array]] = []
    dec_p: List[Dict[str, jax.Array]] = []
    dec_s: List[Dict[str, jax.Array]] = []

    def uniform(key, shape, bound):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    keys = iter(jax.random.split(rng, 64))

    for i in range(6):
        cin, cout = chans[i], chans[i + 1]
        bound = 1.0 / (cin * k * k) ** 0.5
        enc_p.append(
            dict(
                w=uniform(next(keys), (k, k, cin, cout), bound),
                b=uniform(next(keys), (cout,), bound),
                scale=jnp.ones((cout,), jnp.float32),
                bias=jnp.zeros((cout,), jnp.float32),
            )
        )
        enc_s.append(
            dict(mean=jnp.zeros((cout,), jnp.float32),
                 var=jnp.ones((cout,), jnp.float32))
        )

    # decoder in/out channels (reference model.py:79-109; stock table
    # deconv1: 512->256, deconv2: 512->128, deconv3: 256->64,
    # deconv4: 128->32, deconv5: 64->16, deconv6: 32->1) — derived from
    # enc_channels so width-scaled presets (e.g. 'wide') keep the same
    # skip-concat structure: deconv1 takes the bottleneck alone, deconv
    # i>1 takes [prev, enc(6-i)] concatenated (2x channels)
    e = tuple(cfg.enc_channels)
    dec_io = ([(e[5], e[4])]
              + [(e[i] * 2, e[i - 1]) for i in (4, 3, 2, 1)]
              + [(e[0] * 2, 1)])
    for i, (cin, cout) in enumerate(dec_io):
        # torch ConvTranspose2d fan_in = weight.size(1)*k*k = cout*k*k
        bound = 1.0 / (cout * k * k) ** 0.5
        p = dict(
            w=uniform(next(keys), (k, k, cin, cout), bound),
            b=uniform(next(keys), (cout,), bound),
        )
        if i < 5:
            p["scale"] = jnp.ones((cout,), jnp.float32)
            p["bias"] = jnp.zeros((cout,), jnp.float32)
            dec_s.append(
                dict(mean=jnp.zeros((cout,), jnp.float32),
                     var=jnp.ones((cout,), jnp.float32))
            )
        dec_p.append(p)

    return {"enc": enc_p, "dec": dec_p}, {"enc": enc_s, "dec": dec_s}


def packable_edges(cfg: SVSConfig) -> bool:
    """True when the exact packed (space-to-depth) edge-conv lowering
    applies: the reference geometry (kernel 5, stride 2) with the flag on."""
    return bool(cfg.packed_edge_convs and cfg.kernel_size == 5
                and cfg.stride == 2)


def final_dec(p: Dict[str, jax.Array], inp: jax.Array,
              cfg: SVSConfig) -> jax.Array:
    """The BN-less final deconv (decoder level 6, reference model.py:104-109)
    — shared by ``apply`` and the stage runners in ``parallel/pp.py``."""
    cdtype = jnp.dtype(cfg.compute_dtype)
    deconv = (_conv_transpose_packed if packable_edges(cfg)
              else _conv_transpose)
    return deconv(inp, p["w"], cdtype) + p["b"].astype(cdtype)


def make_level_fns(cfg: SVSConfig, *, train: bool,
                   weight: Optional[jax.Array] = None):
    """The per-level building blocks of :func:`apply`, as standalone
    closures — ``(enc_level, dec_level)``.

    Exposed (rather than kept inline in ``apply``) so stage-partitioned
    runners (``parallel/pp.py`` pipeline stages) execute the EXACT same
    level computation as the monolithic forward; ``apply`` itself is built
    on these, so there is one definition to test.

    - ``enc_level(p, s, x, packed) -> (x, mean, var)``: conv s2 -> BN ->
      LeakyReLU (reference model.py:42-77).
    - ``dec_level(p, s, inp, key) -> (x, mean, var)``: deconv -> BN -> ReLU
      -> Dropout2d (reference model.py:79-109; the BN-less final deconv is
      handled by the caller, as in ``apply``).

    ``cfg.remat`` wraps both in ``jax.checkpoint`` exactly as ``apply``
    always did.
    """
    cdtype = jnp.dtype(cfg.compute_dtype)

    def enc_level(p, s, x, packed=False):
        if packed and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _conv_packed(x, p["w"], cdtype) + p["b"].astype(cdtype)
        else:
            x = _conv(x, p["w"], cfg.stride, cdtype) + p["b"].astype(cdtype)
        x, m, v = _batch_norm(
            x, p["scale"], p["bias"], s["mean"], s["var"],
            train=train, eps=cfg.bn_eps, momentum=cfg.bn_momentum,
            weight=weight,
        )
        x = jnp.where(x >= 0, x, cfg.leaky_slope * x)  # LeakyReLU(0.2)
        return x, m, v

    def dec_level(p, s, inp, key):
        x = _conv_transpose(inp, p["w"], cdtype) + p["b"].astype(cdtype)
        x, m, v = _batch_norm(
            x, p["scale"], p["bias"], s["mean"], s["var"],
            train=train, eps=cfg.bn_eps, momentum=cfg.bn_momentum,
            weight=weight,
        )
        x = jnp.maximum(x, 0.0)  # ReLU
        if train:
            x = _dropout2d(x, cfg.dropout_rate, key)
        return x, m, v

    if cfg.remat:
        # rematerialise each level's activations in the backward pass
        # (identical numerics; trades recompute for activation memory on
        # long patches, e.g. the fine_tune preset's 1536 frames)
        enc_level = jax.checkpoint(enc_level, static_argnums=(3,))
        dec_level = jax.checkpoint(dec_level)
    return enc_level, dec_level


def apply(
    params: Params,
    state: State,
    mix: jax.Array,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    cfg: Optional[SVSConfig] = None,
    weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, State]:
    """Predict the sigmoid soft mask for magnitude patches.

    Args:
      mix: (B, F, T) float magnitude patches, F=512 T=multiple-of-64
           (reference feeds (B, 1, 512, 128) NCHW, model.py:169-175).
      train: BatchNorm batch-stats + dropout when True (torch .train() mode).
      dropout_rng: required when train=True.
      weight: optional per-example (B,) 0/1 validity mask — padded examples
           are excluded from BatchNorm batch statistics (train mode only),
           making padded and unpadded batches exactly equivalent.

    Returns (mask (B, F, T) float32, new_state).
    """
    cfg = cfg or SVSConfig()
    cdtype = jnp.dtype(cfg.compute_dtype)
    if train and dropout_rng is None:
        raise ValueError("train=True requires dropout_rng")

    x = mix[..., None].astype(jnp.float32)  # NHWC: (B, F, T, 1)

    # the packed lowering is exact but specific to the reference geometry
    # (kernel 5, stride 2, even spatial dims — true for every preset)
    packable = packable_edges(cfg)

    enc_level, dec_level = make_level_fns(cfg, train=train, weight=weight)

    new_state: State = {"enc": [], "dec": []}
    skips = []
    for i, (p, s) in enumerate(zip(params["enc"], state["enc"])):
        x, m, v = enc_level(p, s, x, packable and i == 0)
        new_state["enc"].append(dict(mean=m, var=v))
        skips.append(x)

    drop_keys = (
        jax.random.split(dropout_rng, 5) if train else [None] * 5
    )
    for i, p in enumerate(params["dec"]):
        if i == 0:
            inp = skips[5]
        else:
            inp = jnp.concatenate([x, skips[5 - i]], axis=-1)
        if i < 5:
            x, m, v = dec_level(p, state["dec"][i], inp, drop_keys[i])
            new_state["dec"].append(dict(mean=m, var=v))
        else:
            x = final_dec(p, inp, cfg)

    mask = jax.nn.sigmoid(x.astype(jnp.float32))
    return mask[..., 0].astype(jnp.float32), new_state


def apply_nchw(params, state, mix_nchw, **kw):
    """Reference-layout entry: (B, 1, 512, 128) in, (B, 1, 512, 128) mask out
    (reference model.py:169-175)."""
    mask, new_state = apply(params, state, mix_nchw[:, 0], **kw)
    return mask[:, None], new_state


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
