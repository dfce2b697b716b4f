"""Config presets, num2str, loss-log parsing, and loss-history persistence."""

import os

import numpy as np
import pytest

from svs_tpu.utils import viz
from svs_tpu.utils.config import (PRESETS, SVSConfig, get_config, num2str)


def test_presets_mirror_reference_constants():
    # active "1209" preset (reference config.py:46-51)
    d = get_config("default")
    assert (d.window_size, d.hop_size, d.sample_rate, d.input_len,
            d.samples_per_song) == (1024, 768, 8192, 128, 64)
    # "Low Res" (config.py:11-16)
    lr = PRESETS["low_res"]
    assert lr.samples_per_song == 8 and lr.sample_rate == 8192
    # "44100" (config.py:18-23)
    hq = PRESETS["hq44k"]
    assert (hq.sample_rate, hq.hop_size, hq.input_len) == (44100, 256, 512)
    # "Fine Tune" (config.py:25-33)
    ft = PRESETS["fine_tune"]
    assert ft.input_len == 1536 and ft.learning_rate == 5e-4
    # "1207" (config.py:35-44)
    p = PRESETS["p1207"]
    assert p.learning_rate == 1e-4 and p.hop_size == 768
    assert d.n_fft_bins == 513


def test_input_lens_divisible_by_64():
    """Every preset's patch length must survive the 6 stride-2 halvings."""
    for name, cfg in PRESETS.items():
        assert cfg.input_len % 64 == 0, name


def test_num2str():
    assert num2str(7) == "0007"
    assert num2str(42) == "0042"
    assert num2str(999) == "0999"
    assert num2str(12345) == "12345"


def test_parse_loss_log(tmp_path):
    p = str(tmp_path / "log.txt")
    with open(p, "w") as f:
        f.write("1.5\n2.5\nVal 9.0\n3.5\nnot-a-number\nVal 8.0\n\n")
    train, val, val_x = viz.parse_loss_log(p)
    assert train == [1.5, 2.5, 3.5]
    assert val == [9.0, 8.0]
    # reference alignment quirk preserved (loss_plot.py:23,41,56: the index
    # counter starts at 1, so a Val after k train losses lands at x=k, one
    # step right of its true train point)
    assert val_x == [2, 3]


def test_plot_losses(tmp_path):
    p = str(tmp_path / "log.txt")
    with open(p, "w") as f:
        f.write("3.0\n2.0\nVal 2.5\n1.0\n")
    out = str(tmp_path / "o.png")
    assert viz.plot_losses(p, out) == out
    assert os.path.getsize(out) > 1000


def test_plot_losses_empty(tmp_path):
    p = str(tmp_path / "empty.txt")
    open(p, "w").close()
    assert viz.plot_losses(p, str(tmp_path / "o.png")) is None


def test_loss_history_persisted(tmp_path):
    """Checkpoints carry loss_list_total across resume (reference
    model.py:112-114, train.py:377-379)."""
    import jax
    from svs_tpu.train import checkpoint as ckpt_lib
    from svs_tpu.train.loop import TrainOptions, fit
    from tests.test_train import _make_spec_dataset

    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir)
    cfg = SVSConfig(samples_per_song=1)
    opts = TrainOptions(
        train_folder=train_dir, valid_folder=str(tmp_path / "novalid"),
        label="h", epoch=2, batch_size=2,
        ckpt_dir=str(tmp_path / "CKPT"), log_dir=str(tmp_path / "LOG"),
        load_path=str(tmp_path / "none.ckpt"), progress=False)
    fit(opts, cfg)

    from svs_tpu.train.step import create_train_state
    template = create_train_state(jax.random.key(0), cfg)
    _, epoch, extras = ckpt_lib.load(
        os.path.join(opts.ckpt_dir, "svs_h.ckpt"), template)
    assert epoch == 2
    hist = extras["loss_list_total"]
    assert len(hist) == 2 and all(np.isfinite(h) for h in hist)

    # resume appends rather than restarting
    opts2 = TrainOptions(**{**opts.__dict__,
                            "load_path": os.path.join(opts.ckpt_dir,
                                                      "svs_h.ckpt"),
                            "epoch": 3})
    fit(opts2, cfg)
    _, _, extras2 = ckpt_lib.load(
        os.path.join(opts.ckpt_dir, "svs_h.ckpt"), template)
    assert len(extras2["loss_list_total"]) == 3
    np.testing.assert_allclose(extras2["loss_list_total"][:2], hist)


def test_hq44k_preset_geometry():
    """The 44.1 kHz presets (reference config.py:18-33) flow through the
    model and loss: input_len 512/1536, hop 256."""
    import jax
    import jax.numpy as jnp
    from svs_tpu.losses.mrstft import combined_loss
    from svs_tpu.models import unet

    cfg = PRESETS["hq44k"]
    params, bn = unet.init(jax.random.key(0), cfg)
    x = jnp.ones((1, 512, cfg.input_len))
    mask, _ = unet.apply(params, bn, x, train=False, cfg=cfg)
    assert mask.shape == (1, 512, cfg.input_len)
    ang = jnp.zeros_like(x)
    total, aux = combined_loss(mask, x, x * 0.5, ang, ang, cfg)
    assert np.isfinite(float(total))
