"""Device-resident data pipeline (data/device_data.py): the HBM dataset +
on-device crop gather must be indistinguishable from the host pipeline —
same batches bit-for-bit, same fit() trajectory."""

import os

import numpy as np
import pytest

import jax

from svs_tpu.data import device_data as dd
from svs_tpu.data.dataset import PatchDataset
from svs_tpu.utils.config import SVSConfig

KEYS = ("mix", "voc", "mix_angle", "voc_angle")


def _make_spec_dataset(root, frames, seed=0):
    rng = np.random.default_rng(seed)
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(root, folder), exist_ok=True)
    for i, t in enumerate(frames):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(os.path.join(root, folder, f"{base}_spec.npy"),
                    rng.random((513, t)).astype(np.float32))
            ang = rng.random((513, t)).astype(np.float32) * 6 - 3
            np.save(os.path.join(root, folder, f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))


@pytest.fixture
def ds(tmp_path):
    # one song LONGER than input_len, one exactly at it, one SHORTER
    # (exercises the zero-pad branch, reference train.py:127-135)
    _make_spec_dataset(str(tmp_path), frames=(300, 128, 70))
    return PatchDataset(str(tmp_path), samples_per_song=4, input_len=128)


def _assert_batches_equal(host_batches, dev_batches):
    host_batches, dev_batches = list(host_batches), list(dev_batches)
    assert len(host_batches) == len(dev_batches)
    for hb, db in zip(host_batches, dev_batches):
        for k in KEYS:
            np.testing.assert_array_equal(np.asarray(db[k]), hb[k],
                                          err_msg=k)


def test_device_batches_bit_identical(ds):
    dev = dd.DeviceDataset(ds)
    for seed in (0, 3):
        _assert_batches_equal(
            ds.batches(5, seed=seed),
            dev.batches(5, seed=seed))


def test_device_batches_nsteps_and_droplast(ds):
    dev = dd.DeviceDataset(ds)
    # n_steps wraparound (multi-host lockstep mode)
    _assert_batches_equal(
        ds.batches(4, seed=1, n_steps=7),
        dev.batches(4, seed=1, n_steps=7))
    _assert_batches_equal(
        ds.batches(5, seed=2, drop_last=True),
        dev.batches(5, seed=2, drop_last=True))
    _assert_batches_equal(
        ds.batches(3, seed=4, shuffle=False),
        dev.batches(3, seed=4, shuffle=False))


def test_resident_bytes_matches_and_gates(ds):
    dev = dd.DeviceDataset(ds)
    assert dd.resident_bytes(ds) == dev.nbytes
    # 3 songs x 4 planes x 512 x 300 x 4B
    assert dev.nbytes == 4 * 3 * 512 * 300 * 4

    assert isinstance(dd.maybe_device_dataset(ds, "on", 0.0001),
                      dd.DeviceDataset)
    assert dd.maybe_device_dataset(ds, "off", 1e9) is ds
    assert dd.maybe_device_dataset(ds, "auto", 0.0001) is ds
    assert isinstance(dd.maybe_device_dataset(ds, "auto", 1e9),
                      dd.DeviceDataset)
    assert dd.maybe_device_dataset(None, "on", 1e9) is None
    with pytest.raises(ValueError):
        dd.maybe_device_dataset(ds, "yes", 1e9)


def test_mesh_device_batches_match_host_distributor(ds):
    """DP-mesh mode: gathered batches equal mesh.shard_batch(host batch)
    bit-for-bit per key — including the zero pad rows and the weight
    vector — and carry the batch-sharded layout."""
    from svs_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    dev = dd.DeviceDataset(ds, mesh=mesh)
    host_b = list(ds.batches(5, seed=7))          # 12 items -> 5,5,2
    dev_b = list(dev.batches(5, seed=7))
    assert len(host_b) == len(dev_b)
    for hb, db in zip(host_b, dev_b):
        sharded = mesh_lib.shard_batch(mesh, hb)
        for k in KEYS + ("weight",):
            np.testing.assert_array_equal(np.asarray(db[k]),
                                          np.asarray(sharded[k]), err_msg=k)
            assert db[k].sharding.is_equivalent_to(
                sharded[k].sharding, db[k].ndim), k

    # pad_rows_to: every batch (incl. the 2-row remainder) keeps ONE fixed
    # shape — the target rounded up to the device count, exactly like
    # multihost.global_batch_from_global — extra rows zero-weighted
    n_dev = int(mesh.devices.size)
    fixed = -(-5 // n_dev) * n_dev
    padded = list(dev.batches(5, seed=7, pad_rows_to=5))
    assert {b["mix"].shape[0] for b in padded} == {fixed}
    expect_w = np.zeros(fixed, np.float32)
    expect_w[:2] = 1.0  # 12 items in batches of 5 -> 2-row remainder
    np.testing.assert_array_equal(np.asarray(padded[-1]["weight"]), expect_w)


def test_tp_mesh_device_batches_match_host_distributor(ds):
    """2-D (data, model) mesh (TP mode): gathered batches pad to the DATA
    axis size (2), not the device count (8), and equal
    mesh.shard_batch(host batch) bit-for-bit with equivalent shardings."""
    from svs_tpu.parallel import mesh as mesh_lib, tp

    mesh = tp.make_2d_mesh(2, 4)
    dev = dd.DeviceDataset(ds, mesh=mesh)
    host_b = list(ds.batches(5, seed=7))          # 12 items -> 5,5,2
    dev_b = list(dev.batches(5, seed=7))
    assert len(host_b) == len(dev_b)
    for hb, db in zip(host_b, dev_b):
        sharded = mesh_lib.shard_batch(mesh, hb)
        for k in KEYS + ("weight",):
            np.testing.assert_array_equal(np.asarray(db[k]),
                                          np.asarray(sharded[k]), err_msg=k)
            assert db[k].sharding.is_equivalent_to(
                sharded[k].sharding, db[k].ndim), k
    # 5 rows pad to 6 (data axis 2), NOT to 8 (total devices)
    assert dev_b[0]["mix"].shape[0] == 6
    assert np.asarray(dev_b[0]["weight"]).sum() == 5.0
@pytest.mark.slow


def test_fit_dp_mesh_device_equals_host(tmp_path):
    """fit() over a DP mesh with the device pipeline reproduces the
    host-pipeline mesh run bitwise (same sharded step program, identical
    padded batches), validation included."""
    from svs_tpu.parallel import mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit

    train_dir = str(tmp_path / "train")
    valid_dir = str(tmp_path / "valid")
    _make_spec_dataset(train_dir, frames=(200, 90), seed=0)
    _make_spec_dataset(valid_dir, frames=(150,), seed=1)
    cfg = SVSConfig(samples_per_song=3, input_len=64)  # 6 items, B=4 -> remainder

    def run(mode, tag):
        opts = TrainOptions(
            train_folder=train_dir, valid_folder=valid_dir,
            label=tag, epoch=2, batch_size=4, val_interval=2,
            ckpt_dir=str(tmp_path / f"CKPT_{tag}"),
            log_dir=str(tmp_path / f"LOG_{tag}"),
            load_path=str(tmp_path / "none.ckpt"), progress=False,
            device_data=mode, mesh=mesh_lib.make_mesh(),
        )
        return fit(opts, cfg)

    s_host = run("off", "mh")
    s_dev = run("on", "md")
    assert int(s_host.step) == int(s_dev.step) == 4
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
@pytest.mark.slow


def test_fit_cp_mesh_device_equals_host(tmp_path):
    """Context-parallel training with device-resident data: the gather
    emits TIME-sharded batches (halo.shard_batch_time layout) and fit()
    reproduces the host-pipeline CP run bitwise."""
    from svs_tpu.parallel import halo, mesh as mesh_lib
    from svs_tpu.train.loop import TrainOptions, fit

    mesh = mesh_lib.make_mesh(2)  # input_len 128 = 64 * 2 shards
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, frames=(200, 90), seed=0)
    cfg = SVSConfig(samples_per_song=2)

    # batch-level: time-sharded gather == shard_batch_time(host batch)
    ds = PatchDataset(train_dir, samples_per_song=2, input_len=128)
    dev = dd.DeviceDataset(ds, mesh=mesh, time_sharded=True)
    for hb, db in zip(ds.batches(3, seed=9), dev.batches(3, seed=9)):
        want = halo.shard_batch_time(mesh, hb)
        for k in KEYS + ("weight",):
            np.testing.assert_array_equal(np.asarray(db[k]),
                                          np.asarray(want[k]), err_msg=k)
            assert db[k].sharding.is_equivalent_to(
                want[k].sharding, db[k].ndim), k

    def run(mode, tag):
        opts = TrainOptions(
            train_folder=train_dir, valid_folder=str(tmp_path / "novalid"),
            label=tag, epoch=2, batch_size=2,
            ckpt_dir=str(tmp_path / f"CKPT_{tag}"),
            log_dir=str(tmp_path / f"LOG_{tag}"),
            load_path=str(tmp_path / "none.ckpt"), progress=False,
            device_data=mode, mesh=mesh, parallel="cp",
        )
        return fit(opts, cfg)

    s_host = run("off", "cph")
    s_dev = run("on", "cpd")
    assert int(s_host.step) == int(s_dev.step) == 4
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
@pytest.mark.slow


def test_fit_device_equals_host(tmp_path):
    """fit() with the device pipeline reproduces the host-pipeline run
    EXACTLY (same jit program + bit-identical batches => bitwise-equal
    params)."""
    from svs_tpu.train.loop import TrainOptions, fit

    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, frames=(200, 90), seed=0)
    cfg = SVSConfig(samples_per_song=2, input_len=64)

    def run(mode, tag):
        opts = TrainOptions(
            train_folder=train_dir, valid_folder=str(tmp_path / "novalid"),
            label=tag, epoch=2, batch_size=2,
            ckpt_dir=str(tmp_path / f"CKPT_{tag}"),
            log_dir=str(tmp_path / f"LOG_{tag}"),
            load_path=str(tmp_path / "none.ckpt"), progress=False,
            device_data=mode,
        )
        return fit(opts, cfg)

    s_host = run("off", "h")
    s_dev = run("on", "d")
    assert int(s_host.step) == int(s_dev.step) == 4
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
