"""Driver benchmark: prints exactly one JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

See svs_tpu/utils/benchmark.py for what is measured.
"""

import json
import logging

if __name__ == "__main__":
    logging.disable(logging.WARNING)
    from svs_tpu.utils.benchmark import run_bench

    print(json.dumps(run_bench()))
