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
    return p


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

    def timeit(f, reps=30):
        r = f()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps * 1e3

    xla_fn = jax.jit(lambda s: jnp.abs(dsp.stft(s, n_fft=1024,
                                                hop_length=768)))
    t_pallas = timeit(lambda: pdsp.stft_magnitude(y, 1024, 768))
    t_xla = timeit(lambda: xla_fn(y))
    err = float(jnp.max(jnp.abs(
        pdsp.stft_magnitude(y, 1024, 768)
        - jnp.abs(dsp.stft(y, n_fft=1024, hop_length=768)))))
    print(json.dumps({
        "metric": "frontend_stft_mag_ms",
        "pallas_ms": round(t_pallas, 3),
        "xla_ms": round(t_xla, 3),
        "max_abs_err": err,
    }))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.disable(logging.WARNING)
    if args.frontend:
        return _frontend_bench(args.secs)
    from svs_tpu.utils.benchmark import run_bench

    print(json.dumps(run_bench(secs=args.secs, reps=args.reps,
                               compute_dtype=args.dtype)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
