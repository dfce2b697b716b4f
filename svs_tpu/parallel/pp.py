"""2-stage pipeline parallelism over a ``stage`` mesh axis.

The reference has no pipeline story (single device, reference train.py:19);
this is a new capability, built the TPU way: the schedule is a ``lax.scan``
whose per-tick cross-stage traffic is ONE symmetric ``ppermute`` swap, and
the reverse pipeline schedule is not hand-written at all — ``jax.grad``
through the scan+ppermute program IS the backward pipeline (ppermute
transposes to the inverted permutation, the scan transposes to the reversed
schedule).

Why the U-Net pipelines cleanly in two stages
---------------------------------------------

Split the U at encoder depth ``k`` (1..5):

- **stage 0** holds encoder levels ``0..k-1`` and the mirror decoder levels
  ``6-k..5`` (+ the final BN-less deconv) — every skip connection those
  decoder levels consume (``skips[k-1..0]``, reference model.py:186-198) is
  produced by stage 0's own encoder levels, so skips NEVER cross the stage
  boundary;
- **stage 1** holds the bottom of the U (encoder ``k..5`` + decoder
  ``0..5-k``), whose skips are likewise all stage-local and consumed within
  the same tick.

The two boundary tensors — the down-going ``enc[k-1]`` output and the
up-going ``dec[5-k]`` output — have IDENTICAL shapes
``(mb, F/2^k, T/2^k, ch[k])`` (the U's mirror symmetry), so each tick ends
with a single same-shaped ``ppermute([(0,1),(1,0)])``: stage 0 sends the
next microbatch down while stage 1 sends the previous one up, full-duplex
on one ICI link.

Schedule (3 virtual stages on 2 devices, ``n_micro + 2`` ticks):

====  ==========================  ======================
tick  stage 0                     stage 1
====  ==========================  ======================
t     A: enc on microbatch t      B: bottom on microbatch t-1
      C: dec+loss on microbatch
      t-2 (consumes the 2-slot
      skip ring written at t-2)
====  ==========================  ======================

Ticks where a virtual stage has no real microbatch run on clamped real data
with a zero validity weight: the loss/aux contributions and the BatchNorm
running-stat updates are gated, so warmup/drain ticks change no state (and
never produce NaNs — clamped inputs are real patches, not zeros).

SPMD uniformity: both devices run the same program; a ``lax.cond`` on
``axis_index("stage")`` picks the stage's work at runtime.  Per-stage
parameters have heterogeneous tree structures, so they travel as
zero-padded flat f32 vectors stacked to ``(2, L)`` and sharded
``P("stage")`` — each device unpacks ITS row inside its branch with static
slicing.  Adam is elementwise, so running optax on the stacked flats is
exactly the tree update (pad lanes have zero grads and stay zero); the
converters below map flat<->tree state losslessly for checkpoint interop.

Semantics vs the single-device step
-----------------------------------

- ``n_micro=1``: numerically equivalent to the single-device step — the
  same program semantics (same batch, same dropout key derivation), but the
  cond/scan/pack plumbing reassociates float reductions, so the pin is at
  float-reassociation tolerance (rtol 2e-6 / atol 5e-6 in tests/test_pp.py),
  not bitwise.
- ``n_micro>1``: GPipe semantics — BatchNorm batch statistics are
  per-microbatch (like training torch at batch ``B/n_micro``), dropout keys
  fold in the microbatch index, the loss is the mean over microbatch
  losses, and BN running stats see the microbatches sequentially.  Pinned
  against a host-level microbatch-loop oracle in tests/test_pp.py.
  Convergence cost of the divergence: measured as ~none — the round-5 A/B
  (scripts/ab_pp_bn.py; ROUND_NOTES r5, artifacts in docs/artifacts/)
  shows the ``n_micro=4`` trajectory tracking whole-batch training within
  ~4% per epoch with BETTER validation loss at the matched epoch and
  equal-or-better held-out SDR at half the epochs — per-microbatch stats
  behave as GhostBN-style regularization here, not a quality tax.
- does NOT compose with ``optax.MultiSteps`` accumulation (microbatching
  already is accumulation) — gated loudly.

When to use: at the reference's 9.6M-param scale DP dominates (see
docs/ARCHITECTURE.md "Parallelism"); PP exists for scaled-up variants where
neither params+optimizer nor a level's activations fit one chip and the
channel axis is already TP-sharded — PP's per-layer traffic is one boundary
tensor per tick regardless of width, the cheapest cut when channels get
fat.  Fully-padded (zero-weight) microbatches are handled exactly: the
liveness gating substitutes an all-ones weight to keep intermediates
finite and zeroes their loss/BN contributions (losses.mrstft._norm0 keeps
the SC gradient defined when both magnitudes sit on the clip floor) —
pinned in tests/test_pp.py.  Only a batch with NO live rows at all remains
the caller's responsibility (same caveat as the unsharded step).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svs_tpu.losses.mrstft import combined_loss
from svs_tpu.models import unet
from svs_tpu.train.step import TrainState, make_optimizer
from svs_tpu.utils.config import SVSConfig


class PPState(NamedTuple):
    """Stage-partitioned train state: ``params``/``bn_state`` are
    ``(2, L)`` zero-padded flat stacks (row = stage), sharded ``P("stage")``;
    ``opt_state`` mirrors ``params``' layout in its Adam moments."""
    params: jax.Array
    bn_state: jax.Array
    opt_state: Any
    step: jax.Array


def make_pp_mesh(stage_axis: str = "stage") -> Mesh:
    """A 1-D 2-device ``("stage",)`` mesh over the first two devices.

    The stage link should be one ICI hop: the boundary activation crosses
    it every tick in both directions.  ``jax.devices()`` order walks the
    ICI torus minor-first, so adjacent devices are adjacent in the ring.
    """
    devs = jax.devices()
    if len(devs) < 2:
        raise ValueError(f"pipeline needs 2 devices, have {len(devs)}")
    if len(devs) > 2:
        print(f"[svs-tpu] pipeline uses 2 of {len(devs)} devices; the other "
              f"{len(devs) - 2} stay idle — use DP (--dp) or TP (--tp) to "
              "engage the full mesh")
    return Mesh(np.asarray(devs[:2]), (stage_axis,))


# --- stage splitting and flat packing --------------------------------------


def split_params(params, split: int) -> Tuple[Dict, Dict]:
    """Partition the U at encoder depth ``split``: stage 0 = enc[:k] +
    dec[6-k:], stage 1 = enc[k:] + dec[:6-k] (module docstring)."""
    k = split
    return (
        {"enc": params["enc"][:k], "dec": params["dec"][6 - k:]},
        {"enc": params["enc"][k:], "dec": params["dec"][:6 - k]},
    )


def join_params(stage0, stage1, split: int):
    """Inverse of :func:`split_params` (works for BN state trees too)."""
    if len(stage0["enc"]) != split:
        raise ValueError(
            f"join_params: stage 0 carries {len(stage0['enc'])} encoder "
            f"levels but split={split} — stages were cut at a different "
            "point than the join expects")
    return {"enc": list(stage0["enc"]) + list(stage1["enc"]),
            "dec": list(stage1["dec"]) + list(stage0["dec"])}


def split_bn(state, split: int) -> Tuple[Dict, Dict]:
    """BN-state analogue of :func:`split_params` — the decoder has only 5
    BN levels (the final deconv is BN-less, reference model.py:104-109)."""
    k = split
    return (
        {"enc": state["enc"][:k], "dec": state["dec"][6 - k:]},
        {"enc": state["enc"][k:], "dec": state["dec"][:6 - k]},
    )


class _Packer:
    """Lossless tree <-> zero-padded flat f32 vector, with the pair of
    per-stage templates fixed at construction (static shapes under jit)."""

    def __init__(self, templates: Tuple[Any, Any]):
        self.leaves: List[List[Any]] = []
        self.defs = []
        self.sizes = []
        for t in templates:
            lv, td = jax.tree.flatten(t)
            self.leaves.append(lv)
            self.defs.append(td)
            self.sizes.append(sum(int(np.prod(l.shape)) for l in lv))
        self.L = max(self.sizes)

    def pack(self, tree, stage: int) -> jax.Array:
        """tree -> (L,) f32, zero-padded (jit- and host-safe)."""
        lv = jax.tree.leaves(tree)
        flat = jnp.concatenate(
            [jnp.ravel(l).astype(jnp.float32) for l in lv]) if lv else \
            jnp.zeros((0,), jnp.float32)
        return jnp.pad(flat, (0, self.L - self.sizes[stage]))

    def pack2(self, tree, split: int, splitter) -> jax.Array:
        """Full tree -> (2, L) stacked stage rows."""
        s0, s1 = splitter(tree, split)
        return jnp.stack([self.pack(s0, 0), self.pack(s1, 1)])

    def unpack(self, flat: jax.Array, stage: int):
        """(L,) -> the stage's tree (static slicing)."""
        out, off = [], 0
        for l in self.leaves[stage]:
            n = int(np.prod(l.shape))
            out.append(jax.lax.slice(flat, (off,), (off + n,))
                       .reshape(l.shape).astype(l.dtype))
            off += n
        return jax.tree.unflatten(self.defs[stage], out)

    def unpack2(self, stacked: jax.Array, split: int, joiner):
        """(2, L) -> the full joined tree."""
        return joiner(self.unpack(stacked[0], 0),
                      self.unpack(stacked[1], 1), split)


def _make_packers(cfg: SVSConfig, split: int) -> Tuple[_Packer, _Packer]:
    """(param packer, bn packer) from the model's abstract init shapes."""
    p_shape, s_shape = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), cfg))
    return (_Packer(split_params(p_shape, split)),
            _Packer(split_bn(s_shape, split)))


# --- the pipelined forward ---------------------------------------------------


def _stage_arch(cfg: SVSConfig, split: int):
    """Static geometry: ((enc levels of stage0, dec levels of stage0),
    (enc levels, dec levels of stage1)) as index ranges."""
    k = split
    if not 1 <= k <= 5:
        raise ValueError(f"split must be in 1..5, got {k}")
    return ((range(0, k), range(6 - k, 6)), (range(k, 6), range(0, 6 - k)))


def _boundary_shape(cfg: SVSConfig, split: int, mb: int, n_frames: int):
    chans = (1,) + tuple(cfg.enc_channels)
    return (mb, cfg.freq_bins // 2 ** split, n_frames // 2 ** split,
            chans[split])


def make_pp_pipeline(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    *,
    n_micro: int = 4,
    split: int = 3,
    stage_axis: str = "stage",
):
    """The shard_mapped pipelined forward+loss:
    ``fn(params2, bn2, batch, rng) -> (loss, (bn_new2, aux))``.

    ``params2``/``bn2`` are the ``(2, L)`` stage stacks; ``batch`` is the
    standard replicated patch batch (B divisible by ``n_micro``); the loss
    is the microbatch-mean, replicated via a final psum.
    """
    cfg = cfg or SVSConfig()
    cdtype = jnp.dtype(cfg.compute_dtype)
    ppack, bpack = _make_packers(cfg, split)
    (enc0, dec0), (enc1, dec1) = _stage_arch(cfg, split)
    k = split
    packable = unet.packable_edges(cfg)
    # "count" accumulates the number of LIVE (non-padding) microbatches the
    # loss actually averaged over — the normalizer below
    aux_zero = {"l1": jnp.float32(0), "mr": jnp.float32(0),
                "total": jnp.float32(0), "count": jnp.float32(0)}

    def pipeline_local(pflat2, bflat2, batch, rng):
        pflat, bflat = pflat2[0], bflat2[0]
        sid = jax.lax.axis_index(stage_axis)
        B, F, T = batch["mix"].shape
        mb = B // n_micro
        mbs = {kk: v.reshape((n_micro, mb) + v.shape[1:])
               for kk, v in batch.items()}
        have_w = "weight" in batch

        def mb_rng(m):
            # n_micro == 1 keeps the single-device step's exact dropout key
            # derivation (unet.apply splits the per-batch rng directly), so
            # the trivial pipeline matches make_train_step's semantics
            return rng if n_micro == 1 else jax.random.fold_in(rng, m)

        def take(name, m):
            return jax.lax.dynamic_index_in_dim(
                mbs[name], m, keepdims=False)

        def safe_w(m):
            """(weight slice or None, liveness in {0.,1.}) for microbatch m.

            A fully-padded microbatch (possible when fit pads a ragged tail
            to the full batch) would hit 0/0 inside the weighted loss and BN
            reductions; substituting an all-ones weight keeps every
            intermediate finite, and the liveness factor gates the (finite)
            garbage out of the loss, aux and BN-state updates exactly."""
            if not have_w:
                return None, jnp.float32(1)
            w = take("weight", m)
            live = jnp.sum(w) > 0
            return (jnp.where(live, w, jnp.ones_like(w)),
                    live.astype(jnp.float32))

        bshape = _boundary_shape(cfg, split, mb, T)
        skip_shapes = [
            (2, mb, F // 2 ** (i + 1), T // 2 ** (i + 1),
             ((1,) + tuple(cfg.enc_channels))[i + 1]) for i in range(k)]

        def stage0_work(ops):
            u_in, skipbuf, bflat, t = ops
            params = ppack.unpack(pflat, 0)
            bn = bpack.unpack(bflat, 0)
            new_bn = {"enc": [], "dec": []}

            # --- A: encoder front on microbatch t (valid while t < n) ---
            mA = jnp.clip(t, 0, n_micro - 1)
            wA, liveA = safe_w(mA)
            validA = (t < n_micro).astype(jnp.float32) * liveA
            enc_level, _ = unet.make_level_fns(cfg, train=True, weight=wA)
            x = take("mix", mA)[..., None].astype(jnp.float32)
            skips = []
            for i in enc0:
                x, m_, v_ = enc_level(params["enc"][i], bn["enc"][i], x,
                                      packable and i == 0)
                new_bn["enc"].append(dict(mean=m_, var=v_))
                skips.append(x.astype(cdtype))
            d_out = x.astype(cdtype)

            # --- C: decoder tail + loss on microbatch t-2 (read the skip
            # ring slot BEFORE A overwrites it: slot (t-2) % 2 == t % 2) ---
            mC = jnp.clip(t - 2, 0, n_micro - 1)
            wC, liveC = safe_w(mC)
            validC = (t >= 2).astype(jnp.float32) * liveC
            _, dec_level = unet.make_level_fns(cfg, train=True, weight=wC)
            slot = jnp.remainder(t, 2)
            drop_keys = jax.random.split(mb_rng(mC), 5)
            x = u_in
            for j in dec0:
                skip = jax.lax.dynamic_index_in_dim(
                    skipbuf[5 - j], slot, keepdims=False)
                inp = jnp.concatenate([x, skip], axis=-1)
                if j < 5:
                    x, m_, v_ = dec_level(params["dec"][j - (6 - k)],
                                          bn["dec"][j - (6 - k)], inp,
                                          drop_keys[j])
                    new_bn["dec"].append(dict(mean=m_, var=v_))
                else:
                    x = unet.final_dec(params["dec"][-1], inp, cfg)
            mask = jax.nn.sigmoid(x.astype(jnp.float32))[..., 0]
            loss, aux = combined_loss(
                mask, take("mix", mC), take("voc", mC),
                take("mix_angle", mC), take("voc_angle", mC), cfg, weight=wC)

            # gate state/loss by validity (warmup/drain ticks are no-ops)
            def gate(new, old, valid):
                return jax.tree.map(
                    lambda a, b: valid * a + (1 - valid) * b, new, old)
            new_bn["enc"] = gate(new_bn["enc"],
                                 [bn["enc"][i] for i in enc0], validA)
            new_bn["dec"] = gate(new_bn["dec"],
                                 [bn["dec"][i] for i in range(len(dec0) - 1)],
                                 validC)
            new_skipbuf = tuple(
                jax.lax.dynamic_update_index_in_dim(skipbuf[i], skips[i],
                                                    slot, 0)
                for i in range(k))
            aux = jax.tree.map(lambda a: a * validC, aux)
            aux["count"] = validC
            return (d_out, new_skipbuf, bpack.pack(new_bn, 0),
                    loss * validC, aux)

        def stage1_work(ops):
            d_in, skipbuf, bflat, t = ops
            params = ppack.unpack(pflat, 1)
            bn = bpack.unpack(bflat, 1)
            mB = jnp.clip(t - 1, 0, n_micro - 1)
            wB, liveB = safe_w(mB)
            validB = ((t >= 1) & (t <= n_micro)).astype(jnp.float32) * liveB
            enc_level, dec_level = unet.make_level_fns(
                cfg, train=True, weight=wB)
            drop_keys = jax.random.split(mb_rng(mB), 5)
            new_bn = {"enc": [], "dec": []}
            # encoder back: skips produced AND consumed within this tick
            x = d_in
            skips = {}
            for i in enc1:
                x, m_, v_ = enc_level(params["enc"][i - k],
                                      bn["enc"][i - k], x, False)
                new_bn["enc"].append(dict(mean=m_, var=v_))
                skips[i] = x
            for j in dec1:
                inp = skips[5] if j == 0 else jnp.concatenate(
                    [x, skips[5 - j]], axis=-1)
                x, m_, v_ = dec_level(params["dec"][j], bn["dec"][j], inp,
                                      drop_keys[j])
                new_bn["dec"].append(dict(mean=m_, var=v_))
            u_out = x.astype(cdtype)
            new_bn = jax.tree.map(
                lambda a, b: validB * a + (1 - validB) * b, new_bn,
                {"enc": [bn["enc"][i - k] for i in enc1],
                 "dec": [bn["dec"][j] for j in dec1]})
            return (u_out, skipbuf, bpack.pack(new_bn, 1),
                    jnp.float32(0), dict(aux_zero))

        def tick(carry, t):
            xfer, skipbuf, bflat, loss_sum, aux_sum = carry
            xfer_out, skipbuf, bflat, loss_t, aux_t = jax.lax.cond(
                sid == 0, stage0_work, stage1_work,
                (xfer, skipbuf, bflat, t))
            xfer_next = jax.lax.ppermute(xfer_out, stage_axis,
                                         [(0, 1), (1, 0)])
            return (xfer_next, skipbuf, bflat, loss_sum + loss_t,
                    jax.tree.map(jnp.add, aux_sum, aux_t)), None

        carry0 = (
            jnp.zeros(bshape, cdtype),
            tuple(jnp.zeros(s, cdtype) for s in skip_shapes),
            bflat,
            jnp.float32(0),
            dict(aux_zero),
        )
        (xfer, _, bflat_new, loss_sum, aux_sum), _ = jax.lax.scan(
            tick, carry0, jnp.arange(n_micro + 2))
        del xfer
        # the loss lives on stage 0 only; psum replicates it (stage 1
        # contributes gated zeros).  Normalize by the LIVE microbatch count
        # (== n_micro except when fit's tail padding killed whole
        # microbatches); max(.,1) only guards the degenerate all-padding
        # batch, where everything is zero anyway.
        aux_sum = jax.tree.map(
            lambda a: jax.lax.psum(a, stage_axis), aux_sum)
        denom = jnp.maximum(aux_sum.pop("count"), 1.0)
        loss = jax.lax.psum(loss_sum, stage_axis) / denom
        aux = jax.tree.map(lambda a: a / denom, aux_sum)
        return loss, (bflat_new[None], aux)

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    return shard_map(
        pipeline_local, mesh=mesh,
        in_specs=(P(stage_axis), P(stage_axis), P(), P()),
        out_specs=(P(), (P(stage_axis), P())),
        check_vma=False,
    )


# --- state conversion --------------------------------------------------------


def _map_adam_moments(opt_state, f):
    """Rebuild an optax state with ``f`` applied to every ScaleByAdamState's
    mu/nu (the only param-shaped leaves in the bare inject_hyperparams(adam)
    chain this module supports)."""
    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(mu=f(s.mu), nu=f(s.nu))
        if hasattr(s, "_fields"):
            return type(s)(*[rec(getattr(s, fld)) for fld in s._fields])
        if isinstance(s, tuple):
            return tuple(rec(x) for x in s)
        return s
    return rec(opt_state)


def _check_opt(opt_state):
    if hasattr(opt_state, "inner_opt_state"):
        raise ValueError(
            "pipeline parallelism does not compose with --accum "
            "(optax.MultiSteps): PP microbatching already accumulates; "
            "use n_micro instead")


def _check_converted(converted, params):
    """Raise a clear error if :func:`_map_adam_moments` left a param-shaped
    leaf unconverted.  The module supports exactly the
    ``inject_hyperparams(adam)`` chain ``make_optimizer`` builds; any other
    optimizer with param-shaped state (SGD momentum trace, stateful
    clipping, ...) keeps its tree through the mapper, and without this
    guard the mismatch would surface only at ``optimizer.update`` as an
    opaque tree-structure error against the (2, L) stacked params.
    Detection is by leaf shape (a converted state holds only (2, L) stacks
    and scalars/hyperparams — nothing kernel- or bias-shaped), so benign
    dict subtrees like inject_hyperparams' ``hyperparams`` pass."""
    param_shapes = {tuple(l.shape) for l in jax.tree.leaves(params)
                    if getattr(l, "ndim", 0) >= 1}
    for leaf in jax.tree.leaves(converted):
        shape = tuple(getattr(leaf, "shape", ()))
        if shape and shape in param_shapes:
            raise ValueError(
                "pipeline parallelism supports only the Adam chain from "
                "svs_tpu.train.step.make_optimizer "
                f"(inject_hyperparams(adam)): a param-shaped {shape} "
                "optimizer-state leaf survived stage packing — this "
                "optimizer's state cannot ride the (2, L) stage stacks")


def state_shardings(mesh: Mesh, shapes: PPState,
                    stage_axis: str = "stage") -> PPState:
    """NamedShardings for a PPState: (2, L) stage stacks shard row-wise,
    scalars replicate (Adam moments mirror params, so the shape rule is
    uniform)."""
    def spec(l):
        s = (P(stage_axis) if getattr(l, "ndim", 0) >= 1
             and l.shape and l.shape[0] == 2 else P())
        return NamedSharding(mesh, s)
    return jax.tree.map(spec, shapes)


def shard_state(state: TrainState, mesh: Mesh,
                cfg: Optional[SVSConfig] = None, *, split: int = 3,
                stage_axis: str = "stage") -> PPState:
    """TrainState (canonical trees) -> stage-partitioned PPState on the
    mesh.  Lossless; :func:`gather_state` inverts it exactly."""
    cfg = cfg or SVSConfig()
    _check_opt(state.opt_state)
    ppack, bpack = _make_packers(cfg, split)
    pp = PPState(
        params=ppack.pack2(state.params, split, split_params),
        bn_state=bpack.pack2(state.bn_state, split, split_bn),
        opt_state=_map_adam_moments(
            state.opt_state,
            lambda t: ppack.pack2(t, split, split_params)),
        step=state.step,
    )
    _check_converted(pp.opt_state, state.params)
    sh = state_shardings(mesh, jax.eval_shape(lambda: pp), stage_axis)
    return jax.tree.map(jax.device_put, pp, sh)


def gather_state(pp: PPState, cfg: Optional[SVSConfig] = None, *,
                 split: int = 3) -> TrainState:
    """PPState -> canonical TrainState (host trees) for checkpointing —
    byte-exact inverse of :func:`shard_state`."""
    cfg = cfg or SVSConfig()
    ppack, bpack = _make_packers(cfg, split)
    pp = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), pp)
    return TrainState(
        params=ppack.unpack2(pp.params, split, join_params),
        bn_state=bpack.unpack2(pp.bn_state, split, join_params),
        opt_state=_map_adam_moments(
            pp.opt_state,
            lambda t: ppack.unpack2(t, split, join_params)),
        step=pp.step,
    )


def pad_batch(batch: Dict[str, np.ndarray], batch_size: int):
    """Host-side drop-free tail padder for the pipelined step: rows padded
    to the fixed ``batch_size`` with a 0/1 ``weight`` (same policy as
    ``parallel.mesh.shard_batch``), keeping ONE jit signature per run.

    Padding may swallow whole microbatches — the pipeline's liveness gating
    handles that exactly (module docstring).  Full batches without an
    existing weight pass through untouched (the unweighted, fastest
    program)."""
    rows = len(next(iter(batch.values())))
    if rows > batch_size:
        raise ValueError(f"batch has {rows} rows > batch_size {batch_size}")
    if rows == batch_size and "weight" not in batch:
        return batch
    pad = batch_size - rows
    out = {k: np.concatenate(
        [np.asarray(v),
         np.zeros((pad,) + np.asarray(v).shape[1:],
                  np.asarray(v).dtype)]) if pad else np.asarray(v)
        for k, v in batch.items() if k != "weight"}
    w = np.asarray(batch.get("weight", np.ones(rows, np.float32)),
                   np.float32)
    out["weight"] = np.concatenate([w, np.zeros(pad, np.float32)])
    return out


def make_pp_eval_step(mesh: Mesh, cfg: Optional[SVSConfig] = None, *,
                      split: int = 3):
    """Jitted validation step on a PPState (reference train.py:316-347
    semantics, same as train.step.make_eval_step): the stage rows are
    unpacked to the full tree inside the program — XLA inserts the
    cross-stage gathers — and the whole-batch eval runs replicated."""
    cfg = cfg or SVSConfig()
    ppack, bpack = _make_packers(cfg, split)

    @jax.jit
    def step(state: PPState, batch):
        params = ppack.unpack2(state.params, split, join_params)
        bn = bpack.unpack2(state.bn_state, split, join_params)
        mask, _ = unet.apply(params, bn, batch["mix"], train=False, cfg=cfg)
        _, aux = combined_loss(
            mask, batch["mix"], batch["voc"],
            batch["mix_angle"], batch["voc_angle"], cfg,
            weight=batch.get("weight"),
        )
        return aux

    return step


# --- the train step ----------------------------------------------------------


def make_pp_train_step(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    *,
    n_micro: int = 4,
    split: int = 3,
    stage_axis: str = "stage",
):
    """Jitted pipelined ``step(pp_state, batch, rng) -> (pp_state, metrics)``.

    Semantics: module docstring (exactly the single-device step at
    ``n_micro=1``; GPipe microbatch semantics otherwise).  Feed it a state
    placed by :func:`shard_state`; buffers are donated and stay sharded.
    """
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    pipeline = make_pp_pipeline(mesh, cfg, n_micro=n_micro, split=split,
                                stage_axis=stage_axis)

    def step(state: PPState, batch, rng):
        grads, (bn_new, aux) = jax.grad(
            lambda p: pipeline(p, state.bn_state, batch, rng),
            has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        # pad lanes and the stacked layout leave the global norm unchanged
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        return PPState(new_params, bn_new, new_opt, state.step + 1), aux

    from svs_tpu.train.step import create_train_state
    tstate = jax.eval_shape(
        lambda: create_train_state(jax.random.key(0), cfg, optimizer))
    _check_opt(tstate.opt_state)
    ppack, bpack = _make_packers(cfg, split)
    pp_shapes = PPState(
        params=jax.ShapeDtypeStruct((2, ppack.L), jnp.float32),
        bn_state=jax.ShapeDtypeStruct((2, bpack.L), jnp.float32),
        opt_state=_map_adam_moments(
            tstate.opt_state,
            lambda t: jax.ShapeDtypeStruct((2, ppack.L), jnp.float32)),
        step=tstate.step,
    )
    _check_converted(pp_shapes.opt_state, tstate.params)
    st_sh = state_shardings(mesh, pp_shapes, stage_axis)
    rep = NamedSharding(mesh, P())

    return jax.jit(step, in_shardings=(st_sh, rep, rep),
                   out_shardings=(st_sh, None), donate_argnums=(0,))
