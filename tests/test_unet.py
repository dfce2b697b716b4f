"""U-Net parity tests vs a torch oracle (BASELINE.json config #2).

The oracle is constructed in-test with torch nn modules wired exactly per the
reference forward contract (reference model.py:169-201): 6 conv levels,
deconvs with output_size pinning, [decoder, encoder] channel concat, sigmoid.
Weights flow through svs_tpu.models.torch_import, so these tests cover both
the layout conversion and the forward math (incl. BatchNorm train/eval).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from svs_tpu.models import torch_import, unet
from svs_tpu.utils.config import SVSConfig

CHANS = [1, 16, 32, 64, 128, 256, 512]
DEC_IO = [(512, 256), (512, 128), (256, 64), (128, 32), (64, 16), (32, 1)]


def build_torch_oracle(seed=0, randomize_stats=True):
    torch.manual_seed(seed)
    m = nn.ModuleDict()
    for i in range(1, 7):
        m[f"conv{i}"] = nn.Sequential(
            nn.Conv2d(CHANS[i - 1], CHANS[i], 5, 2, 2),
            nn.BatchNorm2d(CHANS[i]),
            nn.LeakyReLU(0.2),
        )
    for i, (ci, co) in enumerate(DEC_IO, start=1):
        m[f"deconv{i}"] = nn.ConvTranspose2d(ci, co, 5, 2, 2)
        if i < 6:
            m[f"deconv{i}_BAD"] = nn.Sequential(
                nn.BatchNorm2d(co), nn.ReLU(), nn.Dropout2d(0.0)
            )
    if randomize_stats:
        for i in range(1, 7):
            bn = m[f"conv{i}"][1]
            bn.running_mean.data = torch.randn_like(bn.running_mean) * 0.3
            bn.running_var.data = torch.rand_like(bn.running_var) + 0.5
        for i in range(1, 6):
            bn = m[f"deconv{i}_BAD"][0]
            bn.running_mean.data = torch.randn_like(bn.running_mean) * 0.3
            bn.running_var.data = torch.rand_like(bn.running_var) + 0.5
    return m


def torch_forward(m, x):
    outs = []
    h = x
    for i in range(1, 7):
        h = m[f"conv{i}"](h)
        outs.append(h)
    d = m["deconv1"](outs[5], output_size=outs[4].size())
    d = m["deconv1_BAD"](d)
    for i in range(2, 7):
        d = m[f"deconv{i}"](
            torch.cat([d, outs[6 - i]], 1),
            output_size=outs[5 - i].size() if i < 6 else x.size(),
        )
        if i < 6:
            d = m[f"deconv{i}_BAD"](d)
    return torch.sigmoid(d)


def test_conv_transpose_matches_torch(rng):
    """Layout + padding math of the lhs-dilated deconv equivalence."""
    x = rng.standard_normal((2, 16, 12, 8)).astype(np.float32)  # NHWC, C=8
    w_t = rng.standard_normal((8, 3, 5, 5)).astype(np.float32)  # torch (I,O,kh,kw)
    theirs = F.conv_transpose2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(w_t),
        stride=2, padding=2, output_padding=1,
    ).numpy()
    w_ours = jnp.asarray(torch_import.deconv_weight_to_hwio(w_t))
    ours = unet._conv_transpose(jnp.asarray(x), w_ours, jnp.float32)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert ours.shape == theirs.shape  # exact doubling
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_forward_eval_parity():
    m = build_torch_oracle()
    m.eval()
    sd = {k: v for k, v in m.state_dict().items()}
    params, state = torch_import.params_from_state_dict(sd)

    x = np.random.default_rng(1).random((2, 512, 128)).astype(np.float32)
    with torch.no_grad():
        theirs = torch_forward(m, torch.from_numpy(x[:, None])).numpy()
    ours, _ = unet.apply(params, state, jnp.asarray(x), train=False)
    ours = np.asarray(ours)[:, None]
    assert ours.shape == theirs.shape == (2, 1, 512, 128)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_forward_train_parity_and_bn_stats():
    """Train mode: batch-stat BN + running-stat update semantics (dropout
    disabled on both sides for determinism)."""
    m = build_torch_oracle(seed=3)
    m.train()
    sd0 = {k: v.clone() for k, v in m.state_dict().items()}
    params, state = torch_import.params_from_state_dict(sd0)

    x = np.random.default_rng(2).random((4, 512, 128)).astype(np.float32)
    theirs = torch_forward(m, torch.from_numpy(x[:, None])).detach().numpy()
    sd_after = m.state_dict()

    cfg = SVSConfig(dropout_rate=0.0)
    ours, new_state = unet.apply(
        params, state, jnp.asarray(x), train=True,
        dropout_rng=jax.random.key(0), cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(ours)[:, None], theirs, atol=3e-5)

    # running stats must match torch's momentum-0.1 unbiased update
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(new_state["enc"][i]["mean"]),
            sd_after[f"conv{i+1}.1.running_mean"].numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["enc"][i]["var"]),
            sd_after[f"conv{i+1}.1.running_var"].numpy(), rtol=1e-4, atol=1e-5)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(new_state["dec"][i]["mean"]),
            sd_after[f"deconv{i+1}_BAD.0.running_mean"].numpy(), atol=1e-5)


def test_state_dict_roundtrip():
    m = build_torch_oracle(seed=5)
    sd = {k: v for k, v in m.state_dict().items()}
    params, state = torch_import.params_from_state_dict(sd)
    back = torch_import.params_to_state_dict(params, state)
    for k, v in back.items():
        np.testing.assert_allclose(v, sd[k].numpy(), atol=0)


def test_dropout2d_channelwise():
    x = jnp.ones((8, 4, 4, 32))
    y = unet._dropout2d(x, 0.5, jax.random.key(0))
    y = np.asarray(y)
    # each channel map is entirely 0 or entirely 2.0
    per_chan = y.reshape(8, 16, 32)
    assert set(np.unique(per_chan)) <= {0.0, 2.0}
    zeros = (per_chan == 0).all(axis=1)
    partial = ((per_chan == 0).any(axis=1) & ~zeros)
    assert not partial.any()
    frac = zeros.mean()
    assert 0.3 < frac < 0.7


def test_init_shapes_and_forward():
    params, state = unet.init(jax.random.key(0))
    assert unet.param_count(params) > 9_000_000  # ~9.4M weights like reference
    x = jnp.ones((1, 512, 128))
    mask, _ = unet.apply(params, state, x, train=False)
    m = np.asarray(mask)
    assert m.shape == (1, 512, 128)
    assert (m >= 0).all() and (m <= 1).all()


def test_bfloat16_compute_close_to_f32():
    params, state = unet.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 512, 128)), jnp.float32)
    m32, _ = unet.apply(params, state, x, cfg=SVSConfig(compute_dtype="float32"))
    m16, _ = unet.apply(params, state, x, cfg=SVSConfig(compute_dtype="bfloat16"))
    # masks in [0,1]; bf16 conv compute should stay within a few 1e-2
    assert np.max(np.abs(np.asarray(m32) - np.asarray(m16))) < 0.05


def test_remat_identical_grads(rng):
    """cfg.remat trades memory for recompute with identical numerics."""
    from svs_tpu.losses.masked_l1 import masked_l1_pair

    x = jnp.asarray(rng.random((2, 512, 128)).astype(np.float32))
    voc = x * 0.5
    params, state = unet.init(jax.random.key(0))

    def loss(p, cfg):
        mask, _ = unet.apply(p, state, x, train=True,
                             dropout_rng=jax.random.key(7), cfg=cfg)
        return masked_l1_pair(mask, x, voc)[0]

    g_plain = jax.grad(lambda p: loss(p, SVSConfig()))(params)
    g_remat = jax.grad(lambda p: loss(p, SVSConfig(remat=True)))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_packed_edge_convs_equivalent(rng):
    """cfg.packed_edge_convs lowers enc1 / dec6 as space-to-depth stride-1
    convs — an exact weight rearrangement (models/unet.py).

    Forward is compared in f32.  Gradients are compared in float64: the
    rearrangement is mathematically exact (f64 agreement ~1e-12), but f32
    gradient comparison is chaotic — a ~1e-7 forward rounding difference can
    flip LeakyReLU/ReLU kink branches and BN batch-stat divisions amplify it,
    so two *identical-math* lowerings legitimately diverge at ~1e-3 in f32
    gradient leaves (measured; same effect as reordering a reduction).
    """
    import dataclasses

    cfg_d = SVSConfig()
    cfg_p = dataclasses.replace(cfg_d, packed_edge_convs=True)
    params, state = unet.init(jax.random.key(0), cfg_d)
    x32 = jnp.asarray(rng.random((3, 512, 128)).astype(np.float32))

    m_d, _ = unet.apply(params, state, x32, cfg=cfg_d)
    m_p, _ = unet.apply(params, state, x32, cfg=cfg_p)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_d), atol=2e-6)

    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        cfg_d64 = dataclasses.replace(cfg_d, compute_dtype="float64")
        cfg_p64 = dataclasses.replace(cfg_p, compute_dtype="float64")
        p64 = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        s64 = jax.tree.map(lambda a: np.asarray(a, np.float64), state)
        x = jnp.asarray(np.asarray(x32, np.float64))

        def loss(p, cfg):
            mask, st = unet.apply(p, s64, x, train=True,
                                  dropout_rng=jax.random.key(3), cfg=cfg)
            return jnp.sum(mask * x) + sum(
                jnp.sum(v) for v in jax.tree.leaves(st))

        g_d = jax.grad(lambda p: loss(p, cfg_d64))(p64)
        g_p = jax.grad(lambda p: loss(p, cfg_p64))(p64)
        for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_p)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-30
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-9)

        # remat composes with the packed path (static_argnums on the level
        # fn): direct+remat == packed+remat.  (remat vs non-remat is NOT
        # compared — BN batch stats are f32 by design even under x64, and
        # remat reorders those f32 reductions, which is amplified through
        # activation kinks; that applies equally to both lowerings.)
        g_dr = jax.grad(
            lambda p: loss(p, dataclasses.replace(cfg_d64, remat=True)))(p64)
        g_pr = jax.grad(
            lambda p: loss(p, dataclasses.replace(cfg_p64, remat=True)))(p64)
        for a, b in zip(jax.tree.leaves(g_dr), jax.tree.leaves(g_pr)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-30
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-9)


def test_packed_kernel_rearrangements_exact():
    """The packed kernels reproduce the direct convs tap-for-tap on a
    delta-probe basis (each input position lights one tap)."""
    k = jnp.asarray(np.random.default_rng(1).random((5, 5, 1, 2)), jnp.float32)
    x = jnp.zeros((1, 8, 8, 1), jnp.float32).at[0, 3, 5, 0].set(1.0)
    direct = unet._conv(x, k, 2, jnp.float32)
    packed = unet._conv_packed(x, k, jnp.float32)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               atol=1e-6)

    kd = jnp.asarray(np.random.default_rng(2).random((5, 5, 2, 1)), jnp.float32)
    xd = jnp.asarray(np.random.default_rng(3).random((1, 8, 8, 2)), jnp.float32)
    direct = unet._conv_transpose(xd, kd, jnp.float32)
    packed = unet._conv_transpose_packed(xd, kd, jnp.float32)
    assert direct.shape == packed.shape == (1, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               atol=1e-6)
