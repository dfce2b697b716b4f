"""Measure the reduction-fused Pallas loss (mr_mag_impl='pallas_fused')
against the production matmul_bf16 path inside the full train step on the
real chip — the round-3 attempt VERDICT r2 asked for (next #7), plus the
round-3 'wide' single-matmul shape (one K*hp-deep contraction per block,
ops/pallas/fused_loss.py docstring).

Run on TPU:  python scripts/bench_fused_loss.py [batch]
Prints one JSON line per config; the verdict goes to docs/ROUND_NOTES.md.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svs_tpu.utils.benchmark import train_step_bench
from svs_tpu.utils.config import SVSConfig


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    for dtype in ("bfloat16", "float32"):
        for impl in ("matmul_bf16", "pallas_fused", "pallas_fused_wide"):
            cfg = dataclasses.replace(SVSConfig(), compute_dtype=dtype,
                                      mr_mag_impl=impl)
            try:
                out = train_step_bench(cfg, batch_size=batch)
            except Exception as e:
                out = {"error": repr(e)}
            print(json.dumps(dict({"impl": impl, "dtype": dtype}, **out)),
                  flush=True)


if __name__ == "__main__":
    main()
