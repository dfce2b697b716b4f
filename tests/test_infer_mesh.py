"""Mesh-parallel batch decode (infer/separate.py:separate_magnitude_mesh)
must match the unsharded separate_magnitude per mode — the offline/batch
CLI's multi-chip path (svs-inference --sp/--cp)."""

import numpy as np
import pytest

import jax

from svs_tpu.infer import separate
from svs_tpu.parallel import mesh as mesh_lib
from svs_tpu.train.step import create_train_state
from svs_tpu.utils.config import SVSConfig


@pytest.fixture(scope="module")
def setup():
    cfg = SVSConfig(input_len=64)
    st = create_train_state(jax.random.key(0), cfg)
    mag = np.abs(np.random.default_rng(3).standard_normal(
        (513, 150))).astype(np.float32)
    return cfg, st, mag, mesh_lib.make_mesh()


@pytest.mark.parametrize("mode", ["segments", "overlap"])
@pytest.mark.parametrize("vocal_solo", [True, False])
def test_sp_matches_unsharded(setup, mode, vocal_solo):
    cfg, st, mag, mesh = setup
    want = separate.separate_magnitude(
        st.params, st.bn_state, mag, cfg=cfg, mode=mode,
        vocal_solo=vocal_solo)
    got = separate.separate_magnitude_mesh(
        st.params, st.bn_state, mag, mesh, cfg=cfg, mode=mode,
        vocal_solo=vocal_solo)
    assert got.shape == want.shape == mag.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_whole_routes_to_halo(setup):
    cfg, st, mag, mesh = setup
    want = separate.separate_magnitude(
        st.params, st.bn_state, mag, cfg=cfg, mode="whole")
    got = separate.separate_magnitude_mesh(
        st.params, st.bn_state, mag, mesh, cfg=cfg, mode="whole")
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("t", [1, 63, 64, 65, 200, 513])
def test_sp_matches_unsharded_at_edge_lengths(setup, t):
    """Window-count bucketing (lcm of shard count and _SEG_BUCKET) must not
    change values at any length — including sub-window songs."""
    cfg, st, _, mesh = setup
    mag = np.abs(np.random.default_rng(t).standard_normal(
        (513, t))).astype(np.float32)
    for mode in ("segments", "overlap"):
        want = separate.separate_magnitude(
            st.params, st.bn_state, mag, cfg=cfg, mode=mode)
        got = separate.separate_magnitude_mesh(
            st.params, st.bn_state, mag, mesh, cfg=cfg, mode=mode)
        assert got.shape == want.shape == mag.shape
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"mode={mode} t={t}")


def test_unknown_mode_raises(setup):
    cfg, st, mag, mesh = setup
    with pytest.raises(ValueError, match="unknown mode"):
        separate.separate_magnitude_mesh(
            st.params, st.bn_state, mag, mesh, cfg=cfg, mode="nope")
