"""``evaluate`` CLI — BSS-eval over folders of wavs.

Flag surface + output format preserved from reference evaluate.py:88-182:
  --est --mix --ref --ext --out_csv
"""

from __future__ import annotations

import argparse
import csv
import glob
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Evaluate SVS results with SDR / SIR / SAR / NSDR "
                    "(vocal only).")
    p.add_argument("--est", type=str, required=True,
                   help="predicted vocal wav folder")
    p.add_argument("--mix", type=str, required=True,
                   help="ground-truth mixture wav folder")
    p.add_argument("--ref", type=str, required=True,
                   help="ground-truth vocal wav folder")
    p.add_argument("--ext", type=str, default="wav")
    p.add_argument("--out_csv", type=str, default=None)
    p.add_argument("--jobs", type=int, default=1,
                   help="parallel worker processes (BSS eval is CPU-bound "
                        "per track; the reference evaluates serially)")
    p.add_argument("--impl", type=str, default="numpy",
                   choices=("numpy", "jax"),
                   help="BSS eval backend: 'numpy' (host f64, reference "
                        "parity) or 'jax' (jitted; f64 on CPU, f32 on TPU "
                        "with per-track numpy fallback — see "
                        "evaluation/bss_jax.py).  'jax' does the work on "
                        "the default device, so prefer --jobs 1 with it")
    return p


def _eval_track(paths, impl="numpy"):
    """Worker: one track's metrics (importable for process pools)."""
    pred_path, mix_path, ref_path = paths
    from svs_tpu.data import wav as wavio

    if impl == "jax":
        import svs_tpu
        svs_tpu.enable_compile_cache()  # idempotent; runs in pool workers too
        from svs_tpu.evaluation import bss_jax as bss
    else:
        from svs_tpu.evaluation import bss

    mix, sr_mix = wavio.load_audio(mix_path, sr=None, mono=True)
    ref, sr_ref = wavio.load_audio(ref_path, sr=None, mono=True)
    est, sr_est = wavio.load_audio(pred_path, sr=None, mono=True)
    if not (sr_mix == sr_ref == sr_est):
        raise ValueError(f"Sample rate mismatch: mix={sr_mix}, "
                         f"ref={sr_ref}, est={sr_est}")
    return bss.compute_metrics_for_track(mix, ref, est)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import numpy as np

    pred_files = sorted(glob.glob(os.path.join(args.est, f"*.{args.ext}")))
    if not pred_files:
        print(f"[Error] No *.{args.ext} files found in {args.est}")
        return 1

    all_results = []
    lists = {k: [] for k in ("SDR", "SIR", "SAR", "NSDR")}

    print("=== Start Evaluation ===")
    print(f"#tracks = {len(pred_files)}\n")

    jobs = []
    for pred_path in pred_files:
        basename = os.path.basename(pred_path)
        mix_path = os.path.join(args.mix, basename)
        ref_path = os.path.join(args.ref, basename)
        if not os.path.exists(mix_path):
            print(f"[Warning] Mixture file not found, skip: {mix_path}")
            continue
        if not os.path.exists(ref_path):
            print(f"[Warning] Vocal ref file not found, skip: {ref_path}")
            continue
        jobs.append((basename, (pred_path, mix_path, ref_path)))

    if args.jobs > 1:
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor

        # Forking a parent that already has OS threads (a jax/torch-warm
        # test or embedder) can deadlock the children, while spawn is slow
        # (each worker re-runs interpreter startup) and requires an
        # importable __main__.  The standalone CLI is measured
        # single-threaded even though the package import pulls jax in, so
        # pick by the REAL hazard — the parent's OS thread count (the
        # process-global start method may have been fixed implicitly by
        # unrelated multiprocessing use, so it is not consulted).
        try:  # Linux: count OS threads (C threads included)
            single = len(os.listdir("/proc/self/task")) == 1
        except OSError:  # no /proc: take the platform-safe default
            single = False
        ctx = multiprocessing.get_context("fork" if single else "spawn")
        with ProcessPoolExecutor(max_workers=args.jobs,
                                 mp_context=ctx) as pool:
            futures = [(b, pool.submit(_eval_track, p, args.impl))
                       for b, p in jobs]
            results = []
            for b, f in futures:
                try:
                    results.append((b, f.result()))
                except Exception as e:
                    print(f"[Error] Failed on {b}: {e}")
    else:
        results = []
        for b, p in jobs:
            try:
                results.append((b, _eval_track(p, args.impl)))
            except Exception as e:
                print(f"[Error] Failed on {b}: {e}")

    for basename, metrics in results:
        track = os.path.splitext(basename)[0]
        print(f"{track[:20]}:\t"
              f"SDR={metrics['SDR']:.3f} dB,\t"
              f"SIR={metrics['SIR']:.3f} dB,\t"
              f"SAR={metrics['SAR']:.3f} dB,\t"
              f"NSDR={metrics['NSDR']:.3f} dB")
        for k in lists:
            lists[k].append(metrics[k])
        all_results.append({"track": track, **metrics})

    if not all_results:
        print("\n[Error] No valid tracks evaluated.")
        return 1

    print("\n=== Overall Mean Metrics (vocal) ===")
    print(f"Mean SDR : {np.mean(lists['SDR']):.3f} dB")
    print(f"Mean SIR : {np.mean(lists['SIR']):.3f} dB")
    print(f"Mean SAR : {np.mean(lists['SAR']):.3f} dB")
    print(f"Mean NSDR: {np.mean(lists['NSDR']):.3f} dB")

    if args.out_csv is not None:
        fieldnames = ["track", "SDR", "SIR", "SAR", "NSDR"]
        with open(args.out_csv, "w", newline="", encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames)
            writer.writeheader()
            for row in all_results:
                writer.writerow(row)
        print(f"\n[Info] Results saved to {args.out_csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
