"""Round-3 session-4 chip measurements, all in ONE process (the tunnel
wedges after killed-mid-compile processes — prefer one long run).

Phases, each independently try/excepted and flushed as a JSON line:
  1. fused-loss step bench: matmul_bf16 vs pallas_fused vs pallas_fused_wide
     (the round's new single-matmul kernel shape) at B=32 bf16.
  2. gradient-accumulation A/B on the convergence-demo dataset:
     (batch 32, accum 1) vs (batch 8, accum 4) — same effective batch and
     update count; trajectories should track (BN batch stats legitimately
     differ at microbatch size 8) and held-out SDR should match.
  3. bench.py snapshot (the driver's round-end line, for continuity).

Run on the real TPU:  python scripts/chip_session4.py [workdir]
Results also land in <workdir>/chip_session4.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS = {}


def emit(name, payload):
    RESULTS[name] = payload
    print(json.dumps({name: payload}), flush=True)


def phase_fused_loss(batch=32):
    from svs_tpu.utils.benchmark import train_step_bench
    from svs_tpu.utils.config import get_config

    out = {}
    for impl in ("matmul_bf16", "pallas_fused", "pallas_fused_wide"):
        cfg = dataclasses.replace(get_config("default"), mr_mag_impl=impl)
        r = train_step_bench(cfg, batch_size=batch)
        out[impl] = {"ms_per_step": r.get("train_step_ms"),
                     "mfu_pct": r.get("train_mfu_pct")}
        print(f"  {impl}: {out[impl]}", flush=True)
    emit("fused_loss_step_b32_bf16", out)


def phase_accum_ab(work, epochs=80):
    from convergence_demo import eval_test_sdr, parse_log, prep_splits
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import get_config

    cfg = get_config("default")
    prep_splits(work, cfg)
    print("  prep done", flush=True)

    out = {}
    for arm, (bs, accum) in {"b32_accum1": (32, 1),
                             "b8_accum4": (8, 4)}.items():
        log = os.path.join(work, "LOG", f"log_{arm}.txt")
        if os.path.exists(log):
            os.remove(log)
        t0 = time.perf_counter()
        state = fit(TrainOptions(
            train_folder=os.path.join(work, "spec", "train"),
            valid_folder=os.path.join(work, "spec", "valid"),
            label=arm, epoch=epochs, batch_size=bs, accum_steps=accum,
            val_interval=20, ckpt_dir=os.path.join(work, "CKPT"),
            log_dir=os.path.join(work, "LOG"),
            load_path=os.path.join(work, "none"), progress=False,
            seed=0,
        ), cfg)
        wall = time.perf_counter() - t0
        train_losses, val_losses = parse_log(log)
        out[arm] = {"wall_s": round(wall, 1),
                    "steps": int(state.step),
                    "loss_first": train_losses[0],
                    "loss_ep20": train_losses[19] if len(train_losses) > 19
                    else None,
                    "loss_last": train_losses[-1],
                    "val_best": min(val_losses) if val_losses else None,
                    "test_sdr": [r["sdr"]
                                 for r in eval_test_sdr(state, work, cfg)]}
        print(f"  {arm}: {out[arm]}", flush=True)
    emit("accum_ab", out)


def phase_bench_snapshot():
    from svs_tpu.utils.benchmark import run_bench
    emit("bench_snapshot", run_bench())


def phase_bss_jax(secs=60):
    """Device BSS eval vs the host numpy path on one synthetic track
    (evaluation/bss_jax.py — f32 on TPU, per-track fallback)."""
    import numpy as np

    from svs_tpu.evaluation import bss, bss_jax

    rng = np.random.default_rng(1)
    t = np.arange(secs * 8192) / 8192.0
    bed = np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
    v = 0.7 * bed + 0.3 * rng.standard_normal(t.size)
    a = 0.6 * bed + 0.4 * rng.standard_normal(t.size)
    mix, est = v + a, v + 0.2 * a + 0.05 * rng.standard_normal(t.size)

    t0 = time.perf_counter()
    m_np = bss.compute_metrics_for_track(mix, v, est)
    t_np = time.perf_counter() - t0
    bss_jax.compute_metrics_for_track(mix, v, est)  # compile
    t0 = time.perf_counter()
    m_jx = bss_jax.compute_metrics_for_track(mix, v, est)
    t_jx = time.perf_counter() - t0
    emit("bss_jax_60s", {
        "numpy_s": round(t_np, 3), "jax_s": round(t_jx, 3),
        "max_abs_diff_db": max(abs(m_np[k] - m_jx[k]) for k in m_np),
    })


def _bounded_devices(timeout_s=120.0):
    """Probe jax.devices() under a watchdog: on this rig a wedged tunnel
    makes it block indefinitely (CLAUDE.md), and this script's whole point
    is to run the moment the link returns — fail loudly, don't hang."""
    import threading

    import jax

    probe: list = []

    def _probe():
        try:
            probe.append(jax.devices())
        except Exception as e:  # noqa: BLE001 — surfaced below
            probe.append(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not probe:
        raise RuntimeError(
            f"jax.devices() did not return within {timeout_s:.0f} s — the "
            "tunnel is still wedged; retry when the link recovers.")
    if isinstance(probe[0], Exception):
        raise probe[0]
    return probe[0]


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_session4"
    os.makedirs(work, exist_ok=True)
    print(f"devices: {_bounded_devices()}", flush=True)
    for name, fn in [("fused_loss", phase_fused_loss),
                     ("accum_ab", lambda: phase_accum_ab(work)),
                     ("bss_jax", phase_bss_jax),
                     ("bench", phase_bench_snapshot)]:
        t0 = time.perf_counter()
        print(f"== phase {name}", flush=True)
        try:
            fn()
        except Exception as e:  # keep later phases alive
            emit(name + "_error", repr(e)[:500])
        print(f"== phase {name} done in {time.perf_counter() - t0:.0f}s",
              flush=True)
    with open(os.path.join(work, "chip_session4.json"), "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
