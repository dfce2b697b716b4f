"""Scale-out tour: every parallel mode on one synthetic dataset.

The reference is strictly single-device (SURVEY.md §2.3); this example walks
the TPU-native scale-out surface end to end on a virtual CPU mesh, so it
runs anywhere — on a real slice, drop the forcing block and the same code
uses the chips:

    1. DP training over a mesh (batch-sharded, sync-BN, grad allreduce),
       fed by the HBM-resident dataset (two (B,) index vectors per step)
    2. CP training (--cp): the patch TIME axis sharded with halo exchange —
       the long-patch mode (fine_tune geometry)
    3. TP training (--tp): conv CHANNELS sharded on the "model" axis of a
       2-D (data, model) mesh — GSPMD derives the collectives
    4. ZeRO-1 / FSDP: the same DP step with the optimizer state (and,
       fsdp, params/BN too) sharded across the data axis
    5. segment-parallel + halo time-sharded whole-song inference

Run:  python examples/scaleout.py [workdir]

Multi-host (DCN) jobs use the same ``fit(mesh=...)`` call — each host runs
this program under ``jax.distributed.initialize`` (or launches
``svs-train --multihost``); song sharding, global batch assembly,
coordinated preemption, broadcast-verified resume and (for partitioned
ZeRO/FSDP/TP layouts) collective gather-on-save are automatic
(svs_tpu/parallel/multihost.py, tests/test_multiprocess.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- virtual 8-device CPU mesh (delete on a real slice) --------------------
import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from svs_tpu.data import prep, wav as wavio
from svs_tpu.parallel import halo, mesh as mesh_lib
from svs_tpu.train.loop import TrainOptions, fit
from svs_tpu.utils.config import SVSConfig


def make_songs(root, n=2, secs=16.0, sr=8192):
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * secs)) / sr
    for i in range(n):
        d = os.path.join(root, f"song{i}")
        os.makedirs(d, exist_ok=True)
        vocal = (0.3 * np.sin(2 * np.pi * (440 + 40 * i) * t)).astype(
            np.float32)
        accomp = (0.2 * np.sin(2 * np.pi * 110 * t)
                  + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        wavio.write_wav(os.path.join(d, "vocals.wav"), vocal, sr)
        wavio.write_wav(os.path.join(d, "mixture.wav"), vocal + accomp, sr)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/svs_scaleout"
    cfg = SVSConfig(samples_per_song=8)
    make_songs(os.path.join(work, "songs"), sr=cfg.sample_rate)
    prep.to_spec(os.path.join(work, "songs"), os.path.join(work, "spec"),
                 win_size=cfg.window_size, hop_size=cfg.hop_size,
                 sr=cfg.sample_rate)

    mesh = mesh_lib.make_mesh()  # all devices, 1-D "data" axis
    print(f"mesh: {mesh.devices.size} devices")

    # 1) DP training: batch axis sharded; the device-resident dataset feeds
    #    it batch-sharded gathers directly (no host distributor)
    state = fit(TrainOptions(
        train_folder=os.path.join(work, "spec"),
        valid_folder="missing", label="dp_demo", epoch=2, batch_size=8,
        ckpt_dir=os.path.join(work, "CKPT"),
        log_dir=os.path.join(work, "LOG"),
        load_path="none", progress=False,
        mesh=mesh, parallel="dp",  # device_data="auto" is the default
    ), cfg)
    print(f"DP: trained {int(state.step)} steps over {mesh.devices.size} "
          "devices")

    # 2) CP training: TIME axis of every patch sharded with halo exchange
    #    (needs input_len % (64 * mesh) == 0 — use a 2-device submesh here)
    cp_mesh = mesh_lib.make_mesh(2)
    state_cp = fit(TrainOptions(
        train_folder=os.path.join(work, "spec"),
        valid_folder="missing", label="cp_demo", epoch=1, batch_size=4,
        ckpt_dir=os.path.join(work, "CKPT"),
        log_dir=os.path.join(work, "LOG"),
        load_path="none", progress=False,
        mesh=cp_mesh, parallel="cp",
    ), cfg)
    print(f"CP: trained {int(state_cp.step)} steps, patch time axis split "
          f"across {cp_mesh.devices.size} devices")

    # 3) TP training: conv channels sharded on the "model" axis of a 2-D
    #    (data=2, model=4) mesh; composes with DP on the "data" axis
    #    (parallel/tp.py — the GSPMD channel rule, Adam update stays local)
    from svs_tpu.parallel import tp

    tp_mesh = tp.make_2d_mesh(2, 4)
    state_tp = fit(TrainOptions(
        train_folder=os.path.join(work, "spec"),
        valid_folder="missing", label="tp_demo", epoch=1, batch_size=4,
        ckpt_dir=os.path.join(work, "CKPT"),
        log_dir=os.path.join(work, "LOG"),
        load_path="none", progress=False,
        mesh=tp_mesh, parallel="tp",
    ), cfg)
    print(f"TP: trained {int(state_tp.step)} steps, channels split 4-way, "
          "batch 2-way")

    # 4) FSDP: the DP step with params/BN/Adam moments sharded across the
    #    data axis (ZeRO-3 analogue; zero1=True shards the moments only)
    state_fs = fit(TrainOptions(
        train_folder=os.path.join(work, "spec"),
        valid_folder="missing", label="fsdp_demo", epoch=1, batch_size=8,
        ckpt_dir=os.path.join(work, "CKPT"),
        log_dir=os.path.join(work, "LOG"),
        load_path="none", progress=False,
        mesh=mesh, parallel="dp", fsdp=True,
    ), cfg)
    print(f"FSDP: trained {int(state_fs.step)} steps, state sharded "
          f"{mesh.devices.size}-way")

    # 5) whole-song inference, two sharded ways
    mix, _ = wavio.load_audio(
        os.path.join(work, "songs", "song0", "mixture.wav"),
        sr=cfg.sample_rate)
    mag, phase = prep.stft_magphase(mix, cfg.window_size, cfg.hop_size)

    # segment-parallel: independent input_len windows sharded on dim 0
    # (reference inference.py:79-116 semantics, zero communication) —
    # the same call the batch CLI's --sp flag makes
    from svs_tpu.infer import separate
    masked_sp = separate.separate_magnitude_mesh(
        state.params, state.bn_state, mag, mesh, cfg=cfg, mode="segments")
    print(f"segment-parallel whole song: {mag.shape} -> {masked_sp.shape} "
          f"over {mesh.devices.size} devices")

    masked_halo = halo.separate_magnitude_time_sharded(
        state.params, state.bn_state, mag, mesh, cfg=cfg)
    print(f"halo time-sharded whole song: {mag.shape} -> "
          f"{masked_halo.shape} (bit-identical to the unsharded forward)")
    print("scale-out tour complete")


if __name__ == "__main__":
    main()
