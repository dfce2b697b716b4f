"""``train`` CLI.

Flag surface preserved from reference train.py:157-167:
  --train_folder --load_path --label(required) --epoch --batch_size
  --valid_folder --val_interval
TPU-build extensions: --preset --seed --export_pth --dp --ckpt_dir --log_dir,
parallel layouts (--cp --tp --pp --zero1 --fsdp --accum), compute knobs (--dtype
--remat --device_data --epoch_scan --async_save), validation SDR tracking
(--val_sdr), and multi-host control (--multihost --coordinator --num_hosts
--host_id — makes every parallel layout reachable as one CLI process per
host; TPU pods auto-detect the coordinator).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the SVS U-Net on TPU.")
    p.add_argument("--train_folder", type=str, default="./data/vocals")
    p.add_argument("--load_path", type=str, default="result.ckpt")
    p.add_argument("--label", type=str, required=True)
    p.add_argument("--epoch", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--valid_folder", type=str,
                   default="unet_spectrograms/valid")
    p.add_argument("--val_interval", type=int, default=20)
    # extensions
    p.add_argument("--preset", type=str, default="default",
                   help="config preset (see svs_tpu.utils.config.PRESETS)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--export_pth", action="store_true",
                   help="also write reference-loadable .pth checkpoints")
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed before building the "
                        "mesh, making this process one controller of a "
                        "multi-host job (TPU pods auto-detect the "
                        "coordinator; elsewhere pass --coordinator/"
                        "--num_hosts/--host_id).  Composes with --dp, "
                        "--dp --zero1/--fsdp, --tp and --cp")
    p.add_argument("--coordinator", type=str, default=None,
                   metavar="HOST:PORT",
                   help="jax.distributed coordinator address (implies "
                        "--multihost; requires --num_hosts and --host_id)")
    p.add_argument("--num_hosts", type=int, default=None)
    p.add_argument("--host_id", type=int, default=None)
    p.add_argument("--dp", action="store_true",
                   help="data-parallel training over all visible devices")
    p.add_argument("--cp", action="store_true",
                   help="context-parallel training: the TIME axis of every "
                        "patch is sharded over all visible devices with "
                        "halo exchange (long patches, e.g. --preset "
                        "fine_tune; needs input_len %% (64*devices) == 0)")
    p.add_argument("--tp", type=int, default=None, metavar="K",
                   help="tensor-parallel training: conv channels shard "
                        "K-way on a 'model' mesh axis (parallel/tp.py). "
                        "Alone: a (1, K) mesh; with --dp: a "
                        "(devices//K, K) data x model mesh")
    p.add_argument("--pp", action="store_true",
                   help="pipeline-parallel training: the U-Net's two "
                        "halves live on 2 devices of a ('stage',) mesh; "
                        "microbatches flow through a scanned ppermute "
                        "pipeline (parallel/pp.py; GPipe BN semantics at "
                        "--pp_micro > 1)")
    p.add_argument("--pp_micro", type=int, default=4, metavar="N",
                   help="with --pp: microbatches per step (must divide "
                        "batch_size; 1 == the exact single-device program)")
    p.add_argument("--pp_split", type=int, default=3, metavar="K",
                   help="with --pp: encoder depth where the U splits "
                        "across the two stages (1..5)")
    p.add_argument("--zero1", action="store_true",
                   help="with --dp: shard the optimizer state (Adam "
                        "moments) across the data axis — ZeRO stage 1 "
                        "(parallel/zero.py)")
    p.add_argument("--fsdp", action="store_true",
                   help="with --dp: fully sharded state (params + BN + "
                        "moments across the data axis; XLA gathers "
                        "kernels on use) — the ZeRO-3/FSDP analogue")
    p.add_argument("--accum", type=int, default=1, metavar="K",
                   help="gradient accumulation: update params once every "
                        "K microbatches with their mean gradient "
                        "(effective batch = batch_size*K at batch_size "
                        "HBM cost); resume with the same K")
    p.add_argument("--ckpt_dir", type=str, default="CKPT")
    p.add_argument("--log_dir", type=str, default="LOG")
    p.add_argument("--samples_per_song", type=int, default=None,
                   help="override the preset's virtual-epoch patches/song")
    p.add_argument("--dtype", type=str, default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="conv compute dtype override (bfloat16 is the "
                        "measured-best config: 16.0 vs 18.7 ms/step @ B=32 "
                        "on v5e, grads agree at 1.7e-4 rel)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise U-Net levels in the backward pass "
                        "(halves activation HBM at long patch lengths, "
                        "e.g. --preset fine_tune; measured slightly FASTER "
                        "there too)")
    p.add_argument("--save_every", type=int, default=1,
                   help="latest-checkpoint cadence in epochs (reference "
                        "saves every epoch; each save fetches all params "
                        "to host)")
    p.add_argument("--async_save", action="store_true",
                   help="write checkpoints from a worker thread (hides the "
                        "device->host fetch on slow links)")
    p.add_argument("--device_data", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="keep the spectrogram dataset HBM-resident and "
                        "gather crops on-device — applies to single-chip, "
                        "--dp mesh, --cp mesh and multi-host DP runs "
                        "('auto' gates on --device_data_cap_mb, per device "
                        "on multi-host)")
    p.add_argument("--device_data_cap_mb", type=float, default=2048.0)
    p.add_argument("--val_sdr", action="store_true",
                   help="score vocal SDR/NSDR over the validation songs at "
                        "every validation pass (the reference's headline "
                        "metric, evaluate.py:203-239, tracked during "
                        "training); observability only — best-checkpoint "
                        "selection stays loss-based")
    p.add_argument("--val_sdr_songs", type=int, default=None, metavar="N",
                   help="cap the songs scored per --val_sdr pass")
    p.add_argument("--epoch_scan", action="store_true",
                   help="run each epoch as ONE jitted lax.scan over the "
                        "HBM-resident crops (one dispatch + one loss fetch "
                        "per epoch; requires --device_data on/auto, "
                        "single process, mesh-free or plain --dp)")
    p.add_argument("--augment", action="store_true",
                   help="on-device remix augmentation: random source gains "
                        "+ cross-song vocal remixing, exact via STFT "
                        "linearity (extension — the reference recipe has "
                        "no augmentation)")
    p.add_argument("--remix_p", type=float, default=0.5, metavar="P",
                   help="with --augment: probability a row's vocal is "
                        "swapped for another row's (default 0.5)")
    p.add_argument("--aug_gain", type=float, nargs=2, default=(0.25, 1.25),
                   metavar=("LO", "HI"),
                   help="with --augment: per-source gain range U[LO, HI] "
                        "(default 0.25 1.25)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import get_config

    import dataclasses

    cfg = get_config(args.preset)
    if args.samples_per_song is not None:
        cfg = dataclasses.replace(cfg, samples_per_song=args.samples_per_song)
    if args.dtype:
        cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    if args.remat:
        cfg = dataclasses.replace(cfg, remat=True)
    if args.multihost or args.coordinator is not None:
        # before any mesh building: jax.devices() must be the GLOBAL list
        import jax
        kw = {}
        if args.coordinator is not None:
            if args.num_hosts is None or args.host_id is None:
                raise SystemExit("--coordinator requires --num_hosts and "
                                 "--host_id")
            kw = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_hosts,
                      process_id=args.host_id)
        elif args.num_hosts is not None or args.host_id is not None:
            # would otherwise be silently dropped by the auto-detect path
            raise SystemExit("--num_hosts/--host_id require --coordinator "
                             "(without one, jax.distributed auto-detects "
                             "the process identity)")
        jax.distributed.initialize(**kw)
        print(f"[svs-tpu] multi-host: process "
              f"{jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.local_devices())} local of "
              f"{len(jax.devices())} global devices")
    # after any jax.distributed.initialize (backend init must follow it),
    # before the first compile
    import svs_tpu
    svs_tpu.enable_compile_cache()
    mesh = None
    parallel = "dp"
    if args.cp and (args.dp or args.tp is not None):
        raise SystemExit("--cp is mutually exclusive with --dp/--tp")
    if args.pp and (args.dp or args.cp or args.tp is not None
                    or args.zero1 or args.fsdp):
        raise SystemExit("--pp is mutually exclusive with the other "
                         "parallel layouts")
    if args.pp and args.accum > 1:
        raise SystemExit("--pp does not compose with --accum (pipeline "
                         "microbatching already accumulates; raise "
                         "--pp_micro instead)")
    if args.accum < 1:
        raise SystemExit(f"--accum must be a positive microbatch count, "
                         f"got {args.accum}")
    if (args.zero1 or args.fsdp) and not args.dp:
        raise SystemExit("--zero1/--fsdp shard training state across a "
                         "DP mesh; pass --dp with them")
    if (args.zero1 or args.fsdp) and args.tp is not None:
        raise SystemExit("--zero1/--fsdp compose with --dp only (TP "
                         "already shards the state with its channels)")
    if args.tp is not None:
        if args.tp < 1:
            raise SystemExit(f"--tp must be a positive shard count, "
                             f"got {args.tp}")
        import jax

        from svs_tpu.parallel import tp as tp_lib
        n = len(jax.devices())
        if n % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide the "
                             f"{n} visible devices")
        n_data = n // args.tp if args.dp else 1
        mesh = tp_lib.make_2d_mesh(n_data, args.tp)
        parallel = "tp"
        print(f"Tensor-parallel over a ({n_data} data, {args.tp} model) mesh")
    elif args.pp:
        from svs_tpu.parallel import pp as pp_lib
        mesh = pp_lib.make_pp_mesh()
        parallel = "pp"
        print(f"Pipeline-parallel over 2 stages "
              f"({args.pp_micro} microbatches, split at enc{args.pp_split})")
    elif args.dp or args.cp:
        from svs_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh()
        parallel = "cp" if args.cp else "dp"
        kind = "Context(time)" if args.cp else "Data"
        print(f"{kind}-parallel over {mesh.devices.size} devices")

    opts = TrainOptions(
        train_folder=args.train_folder,
        load_path=args.load_path,
        label=args.label,
        epoch=args.epoch,
        batch_size=args.batch_size,
        valid_folder=args.valid_folder,
        val_interval=args.val_interval,
        ckpt_dir=args.ckpt_dir,
        log_dir=args.log_dir,
        seed=args.seed,
        export_pth=args.export_pth,
        save_every=args.save_every,
        async_save=args.async_save,
        mesh=mesh,
        parallel=parallel,
        pp_micro=args.pp_micro,
        pp_split=args.pp_split,
        device_data=args.device_data,
        device_data_cap_mb=args.device_data_cap_mb,
        epoch_scan=args.epoch_scan,
        zero1=args.zero1,
        fsdp=args.fsdp,
        accum_steps=args.accum,
        val_sdr=args.val_sdr,
        val_sdr_songs=args.val_sdr_songs,
        augment=args.augment,
        remix_p=args.remix_p,
        aug_gain_lo=args.aug_gain[0],
        aug_gain_hi=args.aug_gain[1],
    )
    fit(opts, cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
