"""``bench`` CLI — one-JSON-line end-to-end throughput benchmark."""

from __future__ import annotations

import argparse
import json
import logging


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
    CPU mesh, in a subprocess so the current process's backend is untouched."""
    import subprocess
    import sys
    import time

    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=1200,
    )
    print(json.dumps({
        "metric": "dp_smoke",
        "ok": proc.returncode == 0,
        "devices": 8,
        "wall_s": round(time.perf_counter() - t0, 1),
        "detail": (proc.stdout.strip().splitlines() or [""])[-1]
                  if proc.returncode == 0 else
                  (proc.stderr.strip().splitlines() or [""])[-1],
    }))
    return 0 if proc.returncode == 0 else 1


def _frontend_bench(secs: float) -> int:
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from svs_tpu.ops import stft as dsp
    from svs_tpu.ops.pallas import dsp as pdsp

    y = jnp.asarray((np.random.default_rng(0)
                     .standard_normal(int(8192 * secs)) * 0.3
                     ).astype(np.float32))

    def fetch(r):
        # value fetch as the barrier: on the axon platform block_until_ready
        # returns before execution finishes; fetching a scalar from the LAST
        # result forces it (and, FIFO device queue, everything before it)
        leaf = jax.tree.leaves(r)[0]
        return float(leaf[(0,) * leaf.ndim])

    def timeit(f, reps=100):
        # reps amortise the ~40 ms tunnel round-trip of the closing fetch
        fetch(f())
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        fetch(r)
        return (time.perf_counter() - t0) / reps * 1e3

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
    if args.train:
        import dataclasses

        from svs_tpu.utils.benchmark import train_step_bench
        from svs_tpu.utils.config import SVSConfig

        cfg = SVSConfig()
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
