"""Streaming / PCM16 serving-path tests."""

import numpy as np

import jax

from svs_tpu.infer import separate
from svs_tpu.models import unet
from svs_tpu.utils.config import SVSConfig


def test_stream_matches_single(rng):
    params, bn_state = unet.init(jax.random.key(0))
    cfg = SVSConfig()
    songs = [(rng.standard_normal(8192 * (2 + i)) * 0.1).astype(np.float32)
             for i in range(3)]
    outs = separate.separate_wav_stream(params, bn_state, songs, cfg=cfg)
    assert [len(o) for o in outs] == [len(s) for s in songs]
    for y, o in zip(songs, outs):
        single = separate.separate_wav(params, bn_state, y, cfg=cfg)
        np.testing.assert_allclose(o, single, atol=1e-6)


def test_pcm16_stream_close_to_f32(rng):
    params, bn_state = unet.init(jax.random.key(0))
    cfg = SVSConfig()
    y32 = (rng.standard_normal(8192 * 3) * 0.1).astype(np.float32)
    y16 = (y32 * 32768.0).clip(-32768, 32767).astype(np.int16)
    o16 = separate.separate_wav_stream(params, bn_state, [y16], cfg=cfg,
                                       pcm16=True)[0]
    assert o16.dtype == np.int16
    o32 = separate.separate_wav(params, bn_state, y16.astype(np.float32)
                                / 32768.0, cfg=cfg)
    # one-LSB agreement between on-device-PCM16 and float path
    np.testing.assert_allclose(o16.astype(np.float32) / 32768.0, o32,
                               atol=2.0 / 32768.0)
