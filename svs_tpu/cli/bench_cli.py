"""``bench`` CLI — one-JSON-line end-to-end throughput benchmark."""

from __future__ import annotations

import argparse
import json
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Benchmark full-song separation "
                                            "throughput.")
    p.add_argument("--secs", type=float, default=240.0,
                   help="synthetic song length in seconds")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--dtype", type=str, default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="conv compute dtype override")
    p.add_argument("--frontend", action="store_true",
                   help="microbench the spectrogram front-end instead: "
                        "Pallas fused kernel vs the XLA STFT path")
    p.add_argument("--train", action="store_true",
                   help="microbench the training step instead: ms/step, "
                        "steps/s and MFU at --batch")
    p.add_argument("--batch", type=int, default=32,
                   help="train-bench batch size (reference docs use 32)")
    p.add_argument("--dp-smoke", action="store_true",
                   help="run the 8-device DP train-step + SP-inference "
                        "dryrun on a virtual CPU mesh (subprocess) and "
                        "report pass/fail + wall time")
    return p


def _dp_smoke() -> int:
    """Correctness smoke for the scale-out path (BASELINE config #5): the
    full DP train step + segment-parallel inference on an 8-device virtual
    CPU mesh, in a subprocess so the current process's backend is untouched.

    ``__graft_entry__`` lives at the repo root (not in the installed
    package), so the child runs with cwd pinned there — ``svs-bench
    --dp-smoke`` works from any directory of a source checkout.  A
    site-packages install has no repo root; that is reported as a clear
    error rather than a confusing child ModuleNotFoundError."""
    import subprocess
    import sys
    import time

    import svs_tpu

    repo_root = os.path.dirname(os.path.dirname(
        os.path.abspath(svs_tpu.__file__)))
    if not os.path.exists(os.path.join(repo_root, "__graft_entry__.py")):
        print(json.dumps({
            "metric": "dp_smoke", "ok": False, "devices": 8,
            "detail": f"no __graft_entry__.py next to the package "
                      f"({repo_root}); --dp-smoke needs a source checkout",
        }))
        return 1
    t0 = time.perf_counter()
    try:
        # JAX_PLATFORMS=cpu: the dryrun validates a VIRTUAL CPU mesh — the
        # env flag makes it provision that directly instead of first probing
        # the machine's default backend (which hangs while the tunnelled
        # TPU is in its documented wedge window)
        proc = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            capture_output=True, text=True, timeout=1200, cwd=repo_root,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        ok, tail = proc.returncode == 0, (
            (proc.stdout if proc.returncode == 0 else proc.stderr)
            .strip().splitlines() or [""])[-1]
    except subprocess.TimeoutExpired:
        ok, tail = False, "timeout after 1200s"
    print(json.dumps({
        "metric": "dp_smoke",
        "ok": ok,
        "devices": 8,
        "wall_s": round(time.perf_counter() - t0, 1),
        "detail": tail,
    }))
    return 0 if ok else 1


def _frontend_bench(secs: float) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from svs_tpu.ops import stft as dsp
    from svs_tpu.ops.pallas import dsp as pdsp

    y = jnp.asarray((np.random.default_rng(0)
                     .standard_normal(int(8192 * secs)) * 0.3
                     ).astype(np.float32))

    from svs_tpu.utils.profiling import time_amortized as timeit

    xla_fn = jax.jit(lambda s: jnp.abs(dsp.stft(s, n_fft=1024,
                                                hop_length=768)))
    t_pallas = timeit(lambda: pdsp.stft_magnitude(y, 1024, 768))
    t_xla = timeit(lambda: xla_fn(y))
    err = float(jnp.max(jnp.abs(
        pdsp.stft_magnitude(y, 1024, 768)
        - jnp.abs(dsp.stft(y, n_fft=1024, hop_length=768)))))
    # the production prep path: fused mag+phase kernel vs the XLA FFT+magphase
    t_mp_pallas = timeit(lambda: pdsp.stft_magphase(y, 1024, 768))
    t_mp_xla = timeit(lambda: dsp.stft_magphase_jit(y, n_fft=1024,
                                                    hop_length=768))
    mp_mag, _ = pdsp.stft_magphase(y, 1024, 768)
    xla_mag, _ = dsp.stft_magphase_jit(y, n_fft=1024, hop_length=768)
    mp_err = float(jnp.max(jnp.abs(mp_mag - xla_mag)))
    print(json.dumps({
        "metric": "frontend_stft_ms",
        "mag_pallas_ms": round(t_pallas, 3),
        "mag_xla_ms": round(t_xla, 3),
        "mag_max_abs_err": err,
        "magphase_pallas_ms": round(t_mp_pallas, 3),
        "magphase_xla_ms": round(t_mp_xla, 3),
        "magphase_max_abs_err": mp_err,
    }))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.disable(logging.WARNING)
    if args.frontend:
        return _frontend_bench(args.secs)
    if args.dp_smoke:
        return _dp_smoke()
    # below the outage-safe branches: the remaining modes touch the device
    # anyway, so initializing the backend for the cache decision is free
    import svs_tpu
    svs_tpu.enable_compile_cache()
    if args.train:
        import dataclasses

        from svs_tpu.utils.benchmark import train_step_bench
        from svs_tpu.utils.config import get_config

        cfg = get_config("default")  # the shipped config (bf16)
        if args.dtype:
            cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
        print(json.dumps(dict({"metric": "train_step"},
                              **train_step_bench(cfg, batch_size=args.batch))))
        return 0
    from svs_tpu.utils.benchmark import run_bench

    print(json.dumps(run_bench(secs=args.secs, reps=args.reps,
                               compute_dtype=args.dtype)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
