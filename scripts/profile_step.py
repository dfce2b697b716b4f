"""Decompose the training-step time on the real TPU.

Times each sub-program of the B=32 train step separately (model fwd, model
fwd+bwd, loss fwd+bwd, optimizer) so the non-MXU-bound remainder can be
attributed (VERDICT round-1 item: 13 of 24.9 ms was fwd+bwd that bf16 didn't
speed up).

Methodology: the axon platform's ``block_until_ready`` returns before device
execution finishes, so every burst ends with a VALUE FETCH of a scalar that
(FIFO single-core device queue) forces the whole burst; the ~40 ms tunnel
round-trip is amortised over ``--reps``.

Usage: python scripts/profile_step.py [--reps 100] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


from svs_tpu.utils.profiling import fetch_barrier as fetch  # noqa: E402
from svs_tpu.utils.profiling import time_amortized as bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default=None, choices=[None, "float32",
                                                      "bfloat16"])
    args = ap.parse_args()

    import dataclasses

    from svs_tpu.losses.mrstft import combined_loss
    from svs_tpu.models import unet
    from svs_tpu.train.step import (create_train_state, make_optimizer,
                                    make_train_step)
    from svs_tpu.utils.config import SVSConfig

    cfg = SVSConfig()
    if args.dtype:
        cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    rng = np.random.default_rng(0)
    shape = (args.batch, cfg.freq_bins, cfg.input_len)
    batch = {
        "mix": jax.device_put(rng.random(shape, np.float32)),
        "voc": jax.device_put(rng.random(shape, np.float32) * 0.5),
        "mix_angle": jax.device_put((rng.random(shape, np.float32) - .5) * 6),
        "voc_angle": jax.device_put((rng.random(shape, np.float32) - .5) * 6),
    }
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.key(0), cfg, opt)
    key = jax.random.key(1)
    out = {"batch": args.batch, "dtype": cfg.compute_dtype}

    # 1. full step
    step = make_train_step(cfg, opt)
    compiled = step.lower(state, batch, key).compile()
    st = state
    t = None
    fetch(compiled(st, batch, key)[1]["total"])
    st = create_train_state(jax.random.key(0), cfg, opt)  # donated; rebuild
    t0 = time.perf_counter()
    for _ in range(args.reps):
        st, aux = compiled(st, batch, key)
    fetch(aux["total"])
    out["full_step_ms"] = (time.perf_counter() - t0) / args.reps * 1e3
    state = create_train_state(jax.random.key(0), cfg, opt)

    # 2. model forward, eval mode (inference cost)
    fwd_eval = jax.jit(lambda p, s, x: unet.apply(p, s, x, train=False,
                                                  cfg=cfg)[0])
    out["model_fwd_eval_ms"] = bench(fwd_eval, state.params, state.bn_state,
                                     batch["mix"], reps=args.reps)

    # 3. model forward, train mode (BN batch stats + dropout)
    fwd_train = jax.jit(lambda p, s, x, k: unet.apply(
        p, s, x, train=True, dropout_rng=k, cfg=cfg)[0])
    out["model_fwd_train_ms"] = bench(fwd_train, state.params, state.bn_state,
                                      batch["mix"], key, reps=args.reps)

    # 4. model fwd+bwd WITHOUT the loss graph: grad of a cheap scalar of mask
    def model_obj(p, s, x, k):
        mask, _ = unet.apply(p, s, x, train=True, dropout_rng=k, cfg=cfg)
        return jnp.sum(mask * x)

    model_bwd = jax.jit(jax.grad(model_obj))
    out["model_fwdbwd_ms"] = bench(model_bwd, state.params, state.bn_state,
                                   batch["mix"], key, reps=args.reps)

    # 5. loss graph fwd+bwd WITHOUT the model: grad wrt a given mask
    def loss_obj(mask, b):
        total, _ = combined_loss(mask, b["mix"], b["voc"], b["mix_angle"],
                                 b["voc_angle"], cfg)
        return total

    mask0 = jnp.clip(batch["voc"] / jnp.maximum(batch["mix"], 1e-3), 0, 1)
    loss_bwd = jax.jit(jax.grad(loss_obj))
    out["loss_fwdbwd_ms"] = bench(loss_bwd, mask0, batch, reps=args.reps)

    # 6. optimizer update alone
    grads = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def adam(g, os_, p):
        u, no = opt.update(g, os_, p)
        return jax.tree.map(lambda a, b: a + b, p, u), no

    out["adam_ms"] = bench(adam, grads, state.opt_state, state.params,
                           reps=args.reps)

    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in out.items()}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
