"""Driver benchmark: prints exactly one JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

See svs_tpu/utils/benchmark.py for what is measured.
"""

import json
import logging
import threading


def _backend_alive(timeout_s: float = 600.0) -> bool:
    """Bounded TPU-backend probe.  On this rig the device sits behind a
    tunnel that can wedge for tens of minutes (CLAUDE.md); jax.devices()
    then blocks INDEFINITELY — a bench that hangs is worse than one that
    reports the outage, so probe from a daemon thread with a deadline."""
    ok = threading.Event()

    def probe():
        import jax

        jax.devices()
        ok.set()

    threading.Thread(target=probe, daemon=True).start()
    ok.wait(timeout=timeout_s)
    return ok.is_set()


if __name__ == "__main__":
    logging.disable(logging.WARNING)
    if not _backend_alive():
        print(json.dumps({
            "metric": "decode_device_frames_per_sec", "value": 0,
            "unit": "frames/s", "vs_baseline": 0,
            "error": "device backend init did not complete within 600s "
                     "(tunnel down/recovering) — no measurement possible; "
                     "this round's measured values are recorded in "
                     "docs/ROUND_NOTES.md",
        }))
        raise SystemExit(1)
    from svs_tpu.utils.benchmark import run_bench

    print(json.dumps(run_bench()))
