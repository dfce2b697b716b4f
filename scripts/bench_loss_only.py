"""Loss-graph-only timing on the real chip: grad of combined_loss wrt the
mask (model excluded) for each mr_mag_impl — decides whether the wide
fused kernel is worth the full-step compile fight.

Usage: python scripts/bench_loss_only.py [--reps 100] [--batch 32]
       [--impls matmul_bf16,pallas_fused_wide]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from svs_tpu.losses.mrstft import combined_loss  # noqa: E402
from svs_tpu.utils.config import SVSConfig  # noqa: E402
from svs_tpu.utils.profiling import time_amortized as bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--impls",
                    default="matmul_bf16,pallas_fused,pallas_fused_wide")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    base = SVSConfig()
    shape = (args.batch, base.freq_bins, base.input_len)
    batch = {
        "mix": jax.device_put(rng.random(shape, np.float32)),
        "voc": jax.device_put(rng.random(shape, np.float32) * 0.5),
        "mix_angle": jax.device_put((rng.random(shape, np.float32) - .5) * 6),
        "voc_angle": jax.device_put((rng.random(shape, np.float32) - .5) * 6),
    }
    mask0 = jnp.clip(batch["voc"] / jnp.maximum(batch["mix"], 1e-3), 0, 1)

    for impl in args.impls.split(","):
        cfg = dataclasses.replace(base, mr_mag_impl=impl)

        def loss_obj(mask, b):
            total, _ = combined_loss(mask, b["mix"], b["voc"],
                                     b["mix_angle"], b["voc_angle"], cfg)
            return total

        loss_bwd = jax.jit(jax.grad(loss_obj))
        try:
            ms = bench(loss_bwd, mask0, batch, reps=args.reps)
            g = loss_bwd(mask0, batch)
            out = {"impl": impl, "loss_fwdbwd_ms": round(ms, 3),
                   "grad_norm": round(float(jnp.linalg.norm(g)), 6)}
        except Exception as e:  # noqa: BLE001 — report, keep measuring others
            out = {"impl": impl, "error": repr(e)[:500]}
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
