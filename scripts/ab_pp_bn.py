"""Convergence A/B for pipeline parallelism's GPipe-BN divergence.

VERDICT r4 weak #3 / next #4: ``parallel/pp.py`` documents that
``n_micro > 1`` computes BatchNorm batch statistics PER MICROBATCH (GPipe
semantics; the reference trains whole-batch BN, model.py:47-76) and pins it
against a microbatch-loop oracle — but no A/B showed whether that changes
*trained quality*.  This script runs the missing A/B, same standard as the
bf16 and accum gates (scripts/convergence_demo.py):

    arms (same demo corpus, same seed, same epochs):
      single : mesh-free single-device fit            (whole-batch BN)
      pp1    : 2-stage PP, n_micro=1                  (whole-batch BN;
               pinned float-reassociation-close to `single` in test_pp)
      pp4    : 2-stage PP, n_micro=4                  (GPipe per-microbatch
               BN at batch B/4)

PP needs >= 2 devices and this rig has ONE TPU chip, so the A/B runs on the
virtual CPU mesh (2 virtual devices) with a CPU-sized geometry: the stock
model at sr=8192 / input_len=128 / f32 — small enough that 3 arms finish in
tens of minutes on one core, and the only variable across arms is the BN
semantics under test (dtype/geometry are held fixed).  Absolute SDRs are
demo-scale; the DELTAS between arms are the measurement.

Run:  python scripts/ab_pp_bn.py [workdir] [epochs] [arms]
``arms`` is a comma list from {single,pp1,pp4} (default all three).  On a
single shared core the pp1 arm can be elided: pp1 == single is ALREADY a
pinned invariant (tests/test_pp.py::test_pp_nmicro1_is_the_single_device_step
shows n_micro=1 PP computes the single-device step to float tolerance), so
the BN-semantics question is carried entirely by single-vs-pp4.  Completed
arms are cached in <workdir>/ab_arm_<tag>.json and reused on rerun.
Writes <workdir>/ab_pp_bn.json and prints a markdown table for ROUND_NOTES.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU mesh: PP needs two devices; the single real TPU chip cannot host a
# 2-stage pipeline.  Must run before any device touch.
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_platforms", "cpu")

from convergence_demo import eval_test_sdr, parse_log, prep_splits  # noqa: E402

from svs_tpu.train.loop import TrainOptions, fit  # noqa: E402
from svs_tpu.utils.config import SVSConfig  # noqa: E402


def run_arm(work, cfg, tag, epochs, **kw):
    cache = os.path.join(work, f"ab_arm_{tag}.json")
    if os.path.exists(cache):
        with open(cache) as f:
            row = json.load(f)
        if row.get("epochs") == epochs:
            print(f"[cached] {tag}", flush=True)
            return row
    log = os.path.join(work, "LOG", f"log_{tag}.txt")
    if os.path.exists(log):
        os.remove(log)
    t0 = time.perf_counter()
    state = fit(TrainOptions(
        train_folder=os.path.join(work, "spec", "train"),
        valid_folder=os.path.join(work, "spec", "valid"),
        label=tag, epoch=epochs, batch_size=16, val_interval=10,
        ckpt_dir=os.path.join(work, "CKPT"),
        log_dir=os.path.join(work, "LOG"),
        load_path=os.path.join(work, "none"), progress=False, seed=0,
        **kw,
    ), cfg)
    wall = time.perf_counter() - t0
    train_losses, val_losses = parse_log(log)
    per_song = eval_test_sdr(state, work, cfg)
    row = {
        "arm": tag, "epochs": epochs, "wall_s": round(wall, 1),
        "loss_first": train_losses[0], "loss_last": train_losses[-1],
        "val_best": min(val_losses) if val_losses else None,
        "sdr": [r["sdr"] for r in per_song],
        "nsdr": [r["nsdr"] for r in per_song],
    }
    with open(cache, "w") as f:
        json.dump(row, f)
    return row


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_pp_bn"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    arms = (sys.argv[3].split(",") if len(sys.argv) > 3
            else ["single", "pp1", "pp4"])

    # CPU-sized geometry; f32 keeps CPU conv fast and removes dtype as a
    # variable.  dropout stays at the shipped default: identical seeds give
    # identical masks across arms (n_micro>1 folds the microbatch index
    # into the key BY DESIGN — that divergence is part of GPipe semantics
    # and belongs in the measurement).
    cfg = SVSConfig(sample_rate=8192, hop_size=768, input_len=128,
                    samples_per_song=8, compute_dtype="float32")
    os.makedirs(work, exist_ok=True)
    prep_splits(work, cfg)
    print("prep done", flush=True)

    from svs_tpu.parallel import pp as pp_lib
    mesh = pp_lib.make_pp_mesh()

    ARM_KW = {
        "single": {},
        "pp1": dict(mesh=mesh, parallel="pp", pp_micro=1),
        "pp4": dict(mesh=mesh, parallel="pp", pp_micro=4),
    }
    rows = [run_arm(work, cfg, tag, epochs, **ARM_KW[tag]) for tag in arms]
    for r in rows:
        print(json.dumps(r), flush=True)

    out = os.path.join(work, "ab_pp_bn.json")
    with open(out, "w") as f:
        json.dump({"epochs": epochs, "rows": rows}, f, indent=1)

    print("\n| arm | BN semantics | loss last | val best | test SDR |")
    print("|---|---|---|---|---|")
    sem = {"single": "whole-batch", "pp1": "whole-batch (PP plumbing)",
           "pp4": "per-microbatch (B/4)"}
    for r in rows:
        print(f"| {r['arm']} | {sem[r['arm']]} | {r['loss_last']:.4f} "
              f"| {r['val_best']:.4f} | "
              f"{' / '.join(f'{s:.2f}' for s in r['sdr'])} |")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
