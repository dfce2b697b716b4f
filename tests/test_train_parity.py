"""Train-step parity vs torch (BASELINE.json config #4), at GRADIENT level.

The torch side replays the reference's runnable step end to end: oracle
U-Net forward in train mode (batch-stat BN, dropout off), mask arithmetic,
nn.L1Loss pair (train.py:281-283), DC-repad + torch.istft (train.py:33-60),
auraloss-default MR-STFT (train.py:26,293), alpha-weighted total
(train.py:296), autograd.  The JAX side is the production loss with
mr_mag_impl='fft' (the parity path).  Gradients are compared parameter by
parameter through the layout converters.

Gradients (not post-Adam params) because Adam's first step is sign descent:
reduction-order noise on near-zero grads would create O(lr) param diffs that
say nothing about correctness.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from svs_tpu.losses.mrstft import combined_loss
from svs_tpu.models import torch_import, unet
from svs_tpu.utils.config import SVSConfig
from tests.test_unet import build_torch_oracle, torch_forward


def torch_total_loss(m, mix, voc, mix_angle, voc_angle):
    mask = torch_forward(m, mix)
    pred_vocal = mask * mix
    pred_accomp = (1 - mask) * mix
    target_accomp = torch.clamp(mix - voc, min=0.0)
    l1 = F.l1_loss(pred_vocal, voc) + F.l1_loss(pred_accomp, target_accomp)

    def specific_istft(mag, angle):
        mag = F.pad(mag, (0, 0, 1, 0))
        angle = F.pad(angle, (0, 0, 1, 0))
        cplx = torch.polar(mag, angle).squeeze(1)
        return torch.istft(cplx, n_fft=1024, hop_length=768, win_length=1024,
                           window=torch.hann_window(1024),
                           return_complex=False)

    pred_wav = specific_istft(pred_vocal, mix_angle)
    target_wav = specific_istft(voc, voc_angle)

    mr = 0.0
    for n_fft, hop, win in [(1024, 120, 600), (2048, 240, 1200),
                            (512, 50, 240)]:
        w = torch.hann_window(win)

        def mag_of(sig):
            S = torch.stft(sig, n_fft, hop, win, w, return_complex=True)
            return torch.sqrt(torch.clamp(S.real ** 2 + S.imag ** 2,
                                          min=1e-8))
        xm, ym = mag_of(pred_wav), mag_of(target_wav)
        sc = torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")
        lm = F.l1_loss(torch.log(xm), torch.log(ym))
        mr = mr + sc + lm
    mr = mr / 3.0
    return 166.66 * l1 + 0.66 * mr


def test_gradient_parity_full_step(rng):
    m = build_torch_oracle(seed=11)
    m.train()
    sd = {k: v.clone() for k, v in m.state_dict().items()}
    params, bn_state = torch_import.params_from_state_dict(sd)

    b = 2
    mix = rng.random((b, 512, 128)).astype(np.float32)
    voc = (mix * rng.random((b, 512, 128))).astype(np.float32)
    mix_a = ((rng.random((b, 512, 128)) - 0.5) * 6).astype(np.float32)
    voc_a = ((rng.random((b, 512, 128)) - 0.5) * 6).astype(np.float32)

    # --- torch gradients ---
    t_mix = torch.from_numpy(mix[:, None])
    total = torch_total_loss(m, t_mix, torch.from_numpy(voc[:, None]),
                             torch.from_numpy(mix_a[:, None]),
                             torch.from_numpy(voc_a[:, None]))
    total.backward()
    t_loss = float(total.detach())

    # --- jax gradients (parity loss path, dropout off) ---
    cfg = SVSConfig(dropout_rate=0.0, mr_mag_impl="fft")

    def loss_fn(p):
        mask, _ = unet.apply(p, bn_state, jnp.asarray(mix), train=True,
                             dropout_rng=jax.random.key(0), cfg=cfg)
        total, _ = combined_loss(mask, jnp.asarray(mix), jnp.asarray(voc),
                                 jnp.asarray(mix_a), jnp.asarray(voc_a), cfg)
        return total

    j_loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(j_loss), t_loss, rtol=1e-4)

    def close(a, b, name, scale):
        a, b = np.asarray(a), np.asarray(b)
        tol = max(1e-6, 2e-4 * scale)
        np.testing.assert_allclose(a, b, atol=tol, rtol=2e-3, err_msg=name)

    for i in range(6):
        g_w = m[f"conv{i+1}"][0].weight.grad.numpy()
        ours = torch_import.conv_weight_from_hwio(
            np.asarray(grads["enc"][i]["w"]))
        close(ours, g_w, f"conv{i+1}.weight", np.abs(g_w).max())
        close(grads["enc"][i]["b"], m[f"conv{i+1}"][0].bias.grad.numpy(),
              f"conv{i+1}.bias", np.abs(m[f"conv{i+1}"][0].bias.grad
                                        .numpy()).max())
        close(grads["enc"][i]["scale"], m[f"conv{i+1}"][1].weight.grad
              .numpy(), f"conv{i+1}.bn.weight",
              np.abs(m[f"conv{i+1}"][1].weight.grad.numpy()).max())
    for i in range(6):
        g_w = m[f"deconv{i+1}"].weight.grad.numpy()
        ours = torch_import.deconv_weight_from_hwio(
            np.asarray(grads["dec"][i]["w"]))
        close(ours, g_w, f"deconv{i+1}.weight", np.abs(g_w).max())
