"""Every named preset's geometry flows through the full train graph.

The reference keeps its historical presets as comment blocks
(reference config.py:11-44) that bit-rot silently; here they are live
configs (utils/config.py PRESETS), so pin — without compiling anything,
via jax.eval_shape — that each preset's patch geometry traces through
model init/apply and the combined loss, and that the documented shape
relations hold (freq halvings, mask shape, scalar loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svs_tpu.losses.mrstft import combined_loss
from svs_tpu.models import unet
from svs_tpu.utils.config import PRESETS


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_traces_through_model_and_loss(name):
    cfg = PRESETS[name]
    assert cfg.freq_bins % 64 == 0 and cfg.input_len % 64 == 0, (
        "6 stride-2 levels need multiples of 64 (reference model.py:47-109)")

    params, bn_state = unet.init(jax.random.key(0), cfg)
    b = 2
    patch = jax.ShapeDtypeStruct((b, cfg.freq_bins, cfg.input_len),
                                 jnp.float32)

    def train_graph(p, mix, voc, mix_a, voc_a):
        mask, new_state = unet.apply(p, bn_state, mix, train=True,
                                     dropout_rng=jax.random.key(1), cfg=cfg)
        total, aux = combined_loss(mask, mix, voc, mix_a, voc_a, cfg)
        return mask, new_state, total, aux

    mask, new_state, total, aux = jax.eval_shape(
        train_graph, params, patch, patch, patch, patch)
    assert mask.shape == (b, cfg.freq_bins, cfg.input_len)
    assert total.shape == ()
    assert set(aux) == {"l1", "mr", "total"}
    # BN state keeps its pytree structure (running stats preserved per level)
    assert jax.tree.structure(new_state) == jax.tree.structure(bn_state)

    # eval-mode mask too (inference geometry; whole-song T differs from
    # input_len — use a longer multiple-of-64 extent)
    long_patch = jax.ShapeDtypeStruct((1, cfg.freq_bins, cfg.input_len * 2),
                                      jnp.float32)
    mask2, _ = jax.eval_shape(
        lambda p, x: unet.apply(p, bn_state, x, train=False, cfg=cfg),
        params, long_patch)
    assert mask2.shape == (1, cfg.freq_bins, cfg.input_len * 2)


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_matches_reference_constants(name):
    """Preset values mirror reference config.py's comment blocks
    (config.py:11-51) — spot-pin the distinguishing knobs."""
    cfg = PRESETS[name]
    expect = {
        "low_res": dict(sample_rate=8192, hop_size=768, input_len=128,
                        samples_per_song=8),
        "hq44k": dict(sample_rate=44100, hop_size=256, input_len=512),
        "fine_tune": dict(sample_rate=44100, input_len=1536,
                          learning_rate=5e-4),
        "p1207": dict(sample_rate=44100, hop_size=768, learning_rate=1e-4),
        "default": dict(sample_rate=8192, hop_size=768, input_len=128,
                        samples_per_song=64),
        # not a reference preset: the round-5 scale-out extension — pin the
        # knobs its measured table relies on (8x channels on the stock
        # geometry, accum-not-remat for the HBM fit; ROUND_NOTES r5 table)
        "wide": dict(sample_rate=8192, hop_size=768, input_len=128,
                     enc_channels=(128, 256, 512, 1024, 2048, 4096),
                     remat=False),
    }[name]
    for k, v in expect.items():
        assert getattr(cfg, k) == v, (name, k)


def test_shipped_config_policy():
    """Round-3 shipping policy: presets (the CLI entry points) carry the
    measured-best compute settings — bfloat16 conv compute everywhere,
    remat at the long-patch fine_tune geometry — while bare SVSConfig()
    stays float32 (the reference-exact core the parity tests pin)."""
    from svs_tpu.utils.config import SVSConfig

    assert SVSConfig().compute_dtype == "float32"
    assert SVSConfig().remat is False
    for name, cfg in PRESETS.items():
        assert cfg.compute_dtype == "bfloat16", name
    assert PRESETS["fine_tune"].remat is True
    # 'wide' ships remat OFF: measured at 628M scale it saved almost no
    # peak HBM and cost 20-25% step time (scripts/bench_wide.py, r5)
    for name in ("low_res", "hq44k", "p1207", "default", "wide"):
        assert PRESETS[name].remat is False, name
