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
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.disable(logging.WARNING)
    from svs_tpu.utils.benchmark import run_bench

    print(json.dumps(run_bench(secs=args.secs, reps=args.reps,
                               compute_dtype=args.dtype)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
