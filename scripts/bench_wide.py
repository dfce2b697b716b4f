"""Measured scale-out table for the 'wide' preset (VERDICT r4 next #1).

The stock 9.6M-param model never needs TP/PP/ZeRO/FSDP — pure DP wins
(parallel/tp.py docstring, ROUND_NOTES r3).  The 'wide' preset (8x
channels, 628M params, f32 param+grad+Adam states = 9.4 GiB) is the scale
where the scale-out machinery must EARN its keep.  This script produces
the two halves of the measured table:

  --chip   (real TPU): single-chip arms at wide scale — {f32, bf16} x
           {plain, remat} x {accum}.  Every arm is AOT-compiled and its
           XLA memory analysis recorded (arguments + outputs + temps =
           the allocator's job list) BEFORE deciding to run, so an
           over-budget arm is reported as such from the compiler's own
           numbers without risking a mid-run OOM on the tunnelled rig;
           arms within budget run a fetch-barrier-timed burst (ms/step).

  --mesh   (virtual 8-device CPU): per-device STATE bytes for each
           layout — DP (replicated; computed from the layout rule, not
           materialized: 8 full replicas would be ~75 GiB host RAM),
           ZeRO-1, FSDP, TP 2-D, PP 2-stage — measured from the actual
           addressable shards of the sharded state (layout truth, not
           arithmetic).  Numerical parity of each mode is pinned
           elsewhere (tests/, __graft_entry__ dryrun); running a 628M
           conv model on 1 CPU core is hours and proves nothing new.

Output: one JSON line per arm + a markdown table to stdout (paste into
ROUND_NOTES).  See docs/ROUND_NOTES.md round 5 for the measured results.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GIB = 16.0  # v5e/v5lite HBM per chip (public spec)


def _fmt_gib(b):
    return f"{b / 2**30:.2f}"


def _state_bytes(tree) -> int:
    import jax

    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree)
               if hasattr(l, "dtype"))


def _addressable_bytes_per_device(tree) -> float:
    """Mean per-device bytes actually resident, from the shards the runtime
    placed (counts replication honestly: a replicated leaf contributes its
    full size on every device)."""
    import collections

    import jax

    per_dev: dict = collections.Counter()
    for l in jax.tree.leaves(tree):
        if not hasattr(l, "addressable_shards"):
            continue
        for s in l.addressable_shards:
            per_dev[s.device.id] += s.data.size * s.data.dtype.itemsize
    return sum(per_dev.values()) / max(len(per_dev), 1)


def _batch(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, cfg.freq_bins, cfg.input_len)
    return {
        "mix": rng.random(shape, np.float32),
        "voc": rng.random(shape, np.float32) * 0.5,
        "mix_angle": ((rng.random(shape, np.float32) - 0.5) * 6.0),
        "voc_angle": ((rng.random(shape, np.float32) - 0.5) * 6.0),
    }


def chip_arms(batch_size: int = 32, accum: int = 4, steps: int = 30,
              budget_gib: float = 14.0):
    """Single-chip arms on the real TPU.  ``budget_gib``: only RUN arms the
    compiler's memory analysis puts under this (HBM minus headroom for the
    runtime/framework); everything is still COMPILED and reported."""
    import dataclasses

    import jax

    import svs_tpu
    from svs_tpu.train.step import (create_train_state, make_optimizer,
                                    make_train_step)
    from svs_tpu.utils.config import get_config
    from svs_tpu.utils.profiling import fetch_barrier

    svs_tpu.enable_compile_cache()
    base = get_config("wide")
    big = batch_size * 4  # the batch where naive stops fitting
    arms = [
        # (name, dtype, remat, accum_steps, micro_batch)
        ("naive_f32", "float32", False, 1, batch_size),
        ("naive_bf16", "bfloat16", False, 1, batch_size),
        ("remat_bf16", "bfloat16", True, 1, batch_size),
        ("accum_bf16", "bfloat16", False, accum, batch_size // accum),
        ("remat_accum_bf16", "bfloat16", True, accum, batch_size // accum),
        # global batch 4x: naive must OOM by the compiler's own memory
        # analysis; accum (4 microbatches) and/or remat bring it back under
        # the ceiling — the single-chip "required, not optional" proof
        (f"naive_bf16_B{big}", "bfloat16", False, 1, big),
        (f"remat_bf16_B{big}", "bfloat16", True, 1, big),
        (f"accum_bf16_B{big}", "bfloat16", False, accum, big // accum),
        (f"remat_accum_bf16_B{big}", "bfloat16", True, accum, big // accum),
        # global batch 8x: the first-run measurements put naive's temps at
        # ~47.7 MiB/row (6.1 GiB at B=128), so B=256 projects past the
        # 16-GiB ceiling — the compiler's memory analysis is the OOM proof,
        # and accum at micro-batch 32 stays at the B=32 working set: the
        # arm that makes accumulation REQUIRED, not optional
        (f"naive_bf16_B{2 * big}", "bfloat16", False, 1, 2 * big),
        (f"accum_bf16_B{2 * big}", "bfloat16", False, 2 * accum,
         2 * big // (2 * accum)),
        # global batch 16x: naive projects PAST the 16-GiB chip (strict
        # compiler-proof OOM — the arm is reported, never run); accum at
        # micro 32 still fits and runs.  Accumulation is REQUIRED here.
        (f"naive_bf16_B{4 * big}", "bfloat16", False, 1, 4 * big),
        (f"accum_bf16_B{4 * big}", "bfloat16", False, 4 * accum,
         4 * big // (4 * accum)),
    ]
    results = []
    for name, dtype, remat, k, micro in arms:
        cfg = dataclasses.replace(base, compute_dtype=dtype, remat=remat)
        opt = make_optimizer(cfg, accum_steps=k)
        state = create_train_state(jax.random.key(0), cfg, opt)
        step = make_train_step(cfg, opt)
        batch = {kk: jax.device_put(v)
                 for kk, v in _batch(cfg, micro).items()}
        key = jax.random.key(1)
        t0 = time.perf_counter()
        try:
            compiled = step.lower(state, batch, key).compile()
        except Exception as e:  # compiler-refused: THE OOM proof itself
            msg = re.search(r"Ran out of memory.*?hbm capacity by \S+", str(e))
            row = {"arm": name, "dtype": dtype, "remat": remat, "accum": k,
                   "micro_batch": micro, "global_batch": micro * k,
                   "fits_v5e": False, "step_ms": None,
                   "compile_oom": msg.group(0) if msg else str(e)[:200]}
            del state, batch
            results.append(row)
            print(json.dumps(row), flush=True)
            continue
        compile_s = time.perf_counter() - t0
        try:
            flops = float(compiled.cost_analysis().get("flops", 0.0)) or None
        except Exception:
            flops = None
        mem = compiled.memory_analysis()
        # arguments are donated into outputs for the state, so peak live =
        # max(arg, out) + temp + code; report the analysis fields raw and a
        # conservative projected peak
        arg, out = mem.argument_size_in_bytes, mem.output_size_in_bytes
        tmp, code = mem.temp_size_in_bytes, mem.generated_code_size_in_bytes
        # batch planes are NOT donated; state is. projected = out + temp +
        # code + (args - donated state) ~= out + temp + code + batch bytes
        batch_b = sum(v.size * v.dtype.itemsize for v in batch.values())
        projected = out + tmp + code + batch_b
        row = {
            "arm": name, "dtype": dtype, "remat": remat, "accum": k,
            "micro_batch": micro, "global_batch": micro * k,
            "compile_s": round(compile_s, 1),
            "mem_args_gib": float(_fmt_gib(arg)),
            "mem_out_gib": float(_fmt_gib(out)),
            "mem_temp_gib": float(_fmt_gib(tmp)),
            "mem_code_gib": float(_fmt_gib(code)),
            "mem_projected_peak_gib": float(_fmt_gib(projected)),
            "fits_v5e": projected < V5E_HBM_GIB * 2**30,
        }
        st = aux = None
        if projected < budget_gib * 2**30:
            st = state
            st, aux = compiled(st, batch, key)
            fetch_barrier(aux["total"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(steps):
                    st, aux = compiled(st, batch, key)
                fetch_barrier(aux["total"])
                best = min(best, (time.perf_counter() - t0) / steps)
            row["step_ms"] = round(best * 1e3, 2)
            # per OPTIMIZER step (k microbatches) and per global batch
            row["ms_per_global_batch"] = round(best * 1e3 * k, 2)
            if flops:
                from svs_tpu.utils.benchmark import _device_peak_flops
                peak = _device_peak_flops()
                row["tflops_per_sec"] = round(flops / best / 1e12, 2)
                if peak:
                    row["mfu_pct"] = round(flops / best / peak * 100, 2)
            try:
                stats = jax.devices()[0].memory_stats() or {}
                if "peak_bytes_in_use" in stats:
                    row["peak_hbm_gib"] = float(
                        _fmt_gib(stats["peak_bytes_in_use"]))
            except Exception:
                pass
        else:
            row["step_ms"] = None
            row["skipped"] = (f"projected {row['mem_projected_peak_gib']} "
                              f"GiB > {budget_gib} GiB run budget")
        # free before the next arm: drop EVERY reference (incl. the timed
        # loop's live state chain — `del state` alone leaked ~9 GiB and
        # OOM'd arm 4 on the first run), let the allocator reclaim
        del state, batch, compiled, st, aux
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


def mesh_arms(n_devices: int = 8):
    """Per-device state-residency table on the virtual CPU mesh."""
    import jax

    # provision the virtual CPU platform the proven way (tears down any
    # backend sitecustomize already initialized; never touches the TPU —
    # materializing 628M-param states over the tunnel is a 10-minute hole)
    os.environ["JAX_PLATFORMS"] = "cpu"  # skip-the-probe signal
    import __graft_entry__ as graft

    graft._ensure_devices(n_devices)

    from svs_tpu.models import unet
    from svs_tpu.parallel import mesh as mesh_lib, pp as pp_lib, tp, zero
    from svs_tpu.train.step import create_train_state, make_optimizer
    from svs_tpu.utils.config import get_config

    cfg = get_config("wide")
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.key(0), cfg, opt)
    total = _state_bytes(state.params) + _state_bytes(state.opt_state) \
        + _state_bytes(state.bn_state)
    results = []

    def emit(layout, per_dev, note):
        row = {"layout": layout,
               "state_gib_per_device": float(_fmt_gib(per_dev)),
               "total_state_gib": float(_fmt_gib(total)),
               "devices": n_devices, "note": note}
        results.append(row)
        print(json.dumps(row), flush=True)

    # DP: every leaf replicated — per-device = full state.  Computed from
    # the layout rule (replication), not materialized (~75 GiB on host).
    emit("DP (replicated)", total,
         "params+grads+moments on EVERY chip; > v5e HBM before activations")

    mesh = mesh_lib.make_mesh(n_devices)
    z = zero.shard_state(create_train_state(jax.random.key(0), cfg, opt),
                         mesh)
    emit("ZeRO-1", _addressable_bytes_per_device(z.params)
         + _addressable_bytes_per_device(z.opt_state)
         + _addressable_bytes_per_device(z.bn_state),
         "Adam moments sharded over data axis; params/grads replicated")
    del z

    f = zero.shard_state(create_train_state(jax.random.key(0), cfg, opt),
                         mesh, fsdp=True)
    emit("FSDP", _addressable_bytes_per_device(f.params)
         + _addressable_bytes_per_device(f.opt_state)
         + _addressable_bytes_per_device(f.bn_state),
         "params+moments sharded; kernels gathered on use")
    del f

    if n_devices >= 4:
        mesh2d = tp.make_2d_mesh(2, n_devices // 2)
        t = tp.shard_state(create_train_state(jax.random.key(0), cfg, opt),
                           mesh2d)
        emit(f"TP 2x{n_devices // 2}",
             _addressable_bytes_per_device(t.params)
             + _addressable_bytes_per_device(t.opt_state)
             + _addressable_bytes_per_device(t.bn_state),
             "channels sharded over model axis, replicated over data axis")
        del t

    from jax.sharding import Mesh as _Mesh

    pmesh = _Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    p = pp_lib.shard_state(create_train_state(jax.random.key(0), cfg, opt),
                           pmesh, cfg, split=3)
    emit("PP 2-stage", _addressable_bytes_per_device(p.params)
         + _addressable_bytes_per_device(p.opt_state)
         + _addressable_bytes_per_device(p.bn_state),
         "U split at level 3; stage rows partitioned (incl. liveness pad)")
    del p

    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--chip", action="store_true",
                    help="single-chip arms on the real TPU")
    ap.add_argument("--mesh", action="store_true",
                    help="per-device state table on the virtual CPU mesh")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--budget_gib", type=float, default=14.0)
    args = ap.parse_args()
    if args.mesh:
        rows = mesh_arms()
        print("\n| layout | state GiB/device | fits v5e (16 GiB) w/ acts? |")
        print("|---|---|---|")
        for r in rows:
            fits = "no" if r["state_gib_per_device"] > 12 else "yes"
            print(f"| {r['layout']} | {r['state_gib_per_device']} | {fits} "
                  f"({r['note']}) |")
    if args.chip:
        rows = chip_arms(args.batch, args.accum, args.steps, args.budget_gib)
        print("\n| arm | global B | projected peak GiB | fits v5e | ms/step "
              "| ms/global batch |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            peak = r.get("mem_projected_peak_gib",
                         r.get("compile_oom", "-"))
            print(f"| {r['arm']} | {r['global_batch']} "
                  f"| {peak} "
                  f"| {'yes' if r['fits_v5e'] else 'NO'} "
                  f"| {r.get('step_ms', '-')} "
                  f"| {r.get('ms_per_global_batch', '-')} |")
    if not (args.mesh or args.chip):
        ap.error("pass --chip and/or --mesh")


if __name__ == "__main__":
    main()
