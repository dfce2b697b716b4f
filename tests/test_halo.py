"""Halo-exchange time sharding: the sharded whole-song forward must equal
the unsharded forward on the same (long) patch — this single equivalence
covers the halo arithmetic of all 12 conv levels."""

import numpy as np

import jax
import jax.numpy as jnp

from svs_tpu.models import unet
from svs_tpu.parallel import halo, mesh as mesh_lib
from svs_tpu.utils.config import SVSConfig


def test_time_sharded_equals_unsharded(rng):
    cfg = SVSConfig()
    mesh = mesh_lib.make_mesh()  # 8 CPU devices
    params, bn_state = unet.init(jax.random.key(0), cfg)

    t = 64 * 8 * 2  # 2 granules: 1024 frames, T_loc=128
    mix = rng.random((1, 512, t)).astype(np.float32)

    sharded = halo.make_time_sharded_apply(mesh, cfg)
    got = np.asarray(sharded(params, bn_state, jnp.asarray(mix)))

    want, _ = unet.apply(params, bn_state, jnp.asarray(mix), train=False,
                         cfg=cfg)
    want = np.asarray(want)
    assert got.shape == want.shape == (1, 512, t)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_time_sharded_single_device(rng):
    """n=1 mesh degenerates to plain zero padding."""
    cfg = SVSConfig()
    mesh = mesh_lib.make_mesh(1)
    params, bn_state = unet.init(jax.random.key(1), cfg)
    mix = rng.random((1, 512, 128)).astype(np.float32)
    got = np.asarray(halo.make_time_sharded_apply(mesh, cfg)(
        params, bn_state, jnp.asarray(mix)))
    want, _ = unet.apply(params, bn_state, jnp.asarray(mix), train=False,
                         cfg=cfg)
    np.testing.assert_allclose(got, np.asarray(want), atol=3e-5)


def test_separate_magnitude_time_sharded(rng):
    cfg = SVSConfig()
    mesh = mesh_lib.make_mesh()
    params, bn_state = unet.init(jax.random.key(0), cfg)
    mag = rng.random((513, 700)).astype(np.float32)  # odd length -> pad path
    out = halo.separate_magnitude_time_sharded(params, bn_state, mag, mesh,
                                               cfg=cfg)
    assert out.shape == (513, 700)
    assert (out[0] == 0).all()           # DC row zeroed
    assert (out[1:] <= mag[1:] + 1e-5).all()  # sigmoid mask in [0,1]
    # complementary mask path
    acc = halo.separate_magnitude_time_sharded(params, bn_state, mag, mesh,
                                               cfg=cfg, vocal_solo=False)
    np.testing.assert_allclose(out[1:] + acc[1:], mag[1:], atol=1e-5)
