"""``inference`` CLI — mask prediction over a folder of mixture spectrograms.

Flag surface preserved from reference inference.py:29-34:
  --model_path --tar --mixture_folder --vocal_solo
Extension: --limit N reproduces the reference's hard-coded 20-file cap
(inference.py:59) when wanted; the default processes everything (the cap
reads as a debug leftover — SURVEY.md §7 stage 5).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Separate vocal magnitude from mixture spectrograms.")
    p.add_argument("--model_path", type=str, required=True,
                   help=".ckpt (native) or .pth (reference) checkpoint")
    p.add_argument("--tar", type=str, required=True)
    p.add_argument("--mixture_folder", type=str, required=True)
    p.add_argument("--vocal_solo", type=int, default=1,
                   help="1: keep vocals; 0: remove vocals (1 - mask)")
    p.add_argument("--limit", type=int, default=None,
                   help="process only the first N files (the reference "
                        "hard-codes 20)")
    p.add_argument("--mode", type=str, default="segments",
                   choices=["segments", "whole", "overlap"],
                   help="'segments': reference parity (independent 128-frame "
                        "windows); 'whole': full-song single-patch forward; "
                        "'overlap': 50%%-overlap windows with triangular "
                        "crossfade (no segment seams)")
    p.add_argument("--sp", action="store_true",
                   help="segment-parallel decode: each song's windows shard "
                        "over all visible devices (modes segments/overlap; "
                        "zero communication)")
    p.add_argument("--cp", action="store_true",
                   help="context-parallel decode: the whole song's TIME axis "
                        "shards over all visible devices with halo exchange "
                        "(mode whole only — full temporal context)")
    p.add_argument("--preset", type=str, default="default")
    p.add_argument("--dtype", type=str, default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="override the preset's conv compute dtype — the "
                        "shipped presets run bfloat16 (~1e-3 relative "
                        "output difference); pass float32 for bit-level "
                        "reference parity (parity with the executed "
                        "reference program is pinned at this setting, "
                        "tests/test_reference_program.py)")
    return p


def load_model(model_path: str):
    """Load (params, bn_state) from a native or reference checkpoint."""
    import jax
    from svs_tpu.train import checkpoint as ckpt_lib
    from svs_tpu.train.step import create_train_state

    template = create_train_state(jax.random.key(0))
    # params/BN only: skip optimizer-state restoration so checkpoints from
    # ANY training configuration (e.g. --accum's MultiSteps layout) load
    state, _, _ = ckpt_lib.resume(model_path, template, restore_opt=False)
    return state.params, state.bn_state


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import numpy as np
    from tqdm import tqdm

    import svs_tpu
    from svs_tpu.infer import separate
    from svs_tpu.utils.config import get_config

    svs_tpu.enable_compile_cache()

    cfg = get_config(args.preset)
    if args.dtype:
        import dataclasses
        cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    mesh = None
    if args.sp or args.cp:
        if args.sp and args.cp:
            raise SystemExit("--sp and --cp are mutually exclusive")
        if args.sp and args.mode == "whole":
            raise SystemExit("--sp shards windows (modes segments/overlap); "
                             "use --cp for whole-song decode")
        if args.cp and args.mode != "whole":
            raise SystemExit("--cp time-shards the whole song; "
                             "pass --mode whole")
        from svs_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh()
        kind = "Segment" if args.sp else "Context(time)"
        print(f"{kind}-parallel decode over {mesh.devices.size} devices")
    os.makedirs(args.tar, exist_ok=True)

    try:
        params, bn_state = load_model(args.model_path)
    except Exception as e:
        print(f"Failed to load model: {e}")
        return 1

    files = sorted(f for f in os.listdir(args.mixture_folder)
                   if f.endswith("_spec.npy"))
    if args.limit is not None:
        files = files[: args.limit]
    print(f"Found {len(files)} files, processing...")

    for name in tqdm(files):
        mix = np.load(os.path.join(args.mixture_folder, name))
        if mesh is not None:
            out = separate.separate_magnitude_mesh(
                params, bn_state, mix, mesh,
                vocal_solo=bool(args.vocal_solo), cfg=cfg, mode=args.mode)
        else:
            out = separate.separate_magnitude(
                params, bn_state, mix, vocal_solo=bool(args.vocal_solo),
                cfg=cfg, mode=args.mode)
        np.save(os.path.join(args.tar, name), out)

    print("Separation finished!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
