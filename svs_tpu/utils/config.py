"""Experiment configuration.

The reference keeps hyperparameters as module-level constants star-imported
everywhere (reference config.py:47-51) with historical presets left as comments
(config.py:11-44).  Here the same knobs are a frozen dataclass with named
presets, while module-level constants mirroring the reference's active preset
("1209", config.py:46-51) are still exported for CLI default parity.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SVSConfig:
    """All knobs of the SVS pipeline.

    Mirrors reference config.py constants plus the implicit architecture /
    training constants scattered through reference model.py / train.py.
    """

    # --- DSP (reference config.py:47-49) ---
    window_size: int = 1024
    hop_size: int = 768
    sample_rate: int = 8192

    # --- patching (reference config.py:50-51) ---
    input_len: int = 128          # time frames per training patch
    samples_per_song: int = 64    # virtual-epoch patches per song

    # --- model (reference model.py:47-109) ---
    freq_bins: int = 512          # 513 rfft bins with DC dropped (train.py:110-113)
    enc_channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    kernel_size: int = 5
    stride: int = 2
    leaky_slope: float = 0.2      # model.py:50
    dropout_rate: float = 0.5     # model.py:83
    bn_eps: float = 1e-5          # torch BatchNorm2d default
    bn_momentum: float = 0.1      # torch BatchNorm2d default

    # --- training (reference train.py:24-25, model.py:116) ---
    learning_rate: float = 1e-3
    lr_drop_epoch: int = 400      # train.py:251
    lr_after_drop: float = 5e-4   # train.py:252
    alpha_l1: float = 166.66      # train.py:24
    alpha_mr: float = 0.66        # train.py:25

    # --- MR-STFT loss resolutions (auraloss MultiResolutionSTFTLoss defaults,
    #     constructed at reference train.py:26) ---
    mr_fft_sizes: Tuple[int, ...] = (1024, 2048, 512)
    mr_hop_sizes: Tuple[int, ...] = (120, 240, 50)
    mr_win_lengths: Tuple[int, ...] = (600, 1200, 240)
    # 'matmul_bf16': windowed-DFT MXU matmuls (3.9x faster step on v5e,
    # loss equal to ~1e-3 rel); 'fft': exact auraloss-parity path
    mr_mag_impl: str = "matmul_bf16"

    # --- compute ---
    compute_dtype: str = "float32"   # "float32" | "bfloat16" for conv compute
    # lower the channel-starved edge layers (first conv: 1 input channel,
    # last deconv: 1 output channel) as space-to-depth-packed stride-1 3x3
    # convs instead of stride-2 / lhs-dilated 5x5 convs.  Exact weight
    # rearrangement — same taps, same sums, checkpoints untouched (see
    # models/unet.py packed lowerings); these two layers are otherwise ~half
    # the model's fwd+bwd time on v5e because the MXU runs nearly empty at
    # 1-channel depth
    packed_edge_convs: bool = False
    # rematerialise encoder/decoder levels in the backward pass.  Measured
    # on v5e at the fine_tune geometry (B=4 x 512 x 1536, bf16): temp HBM
    # 1977 -> 1035 MB AND step 37.3 -> 35.1 ms — recompute beats activation
    # spill on this bandwidth-bound model, so turn this ON for long patches
    # or big batches; off by default only to keep the parity-test gradient
    # path byte-stable
    remat: bool = False

    @property
    def n_fft_bins(self) -> int:
        return self.window_size // 2 + 1  # 513


# Named presets mirroring the reference's comment-block presets
# (reference config.py:11-51).
#
# SHIPPED-CONFIG POLICY (round 3): presets are the production entry points
# (every CLI resolves --preset through here) and carry the MEASURED-BEST
# compute settings — bfloat16 conv compute (16.0 vs 18.7 ms/step @ B=32 on
# v5e, grads agree at 1.7e-4 rel, convergence demo A/B'd on-chip), plus
# remat for the long-patch fine_tune geometry (HBM halved AND slightly
# faster, docs/ROUND_NOTES).  Bare ``SVSConfig()`` stays float32: it is the
# reference-exact numerical core that the torch-oracle parity tests pin
# byte-stable.  Opt out per-run with ``--dtype float32``.
PRESETS = {
    # "Low Res Train Params" (config.py:11-16)
    "low_res": SVSConfig(sample_rate=8192, hop_size=768, input_len=128,
                         samples_per_song=8, compute_dtype="bfloat16"),
    # "44100 Params" (config.py:18-23)
    "hq44k": SVSConfig(sample_rate=44100, hop_size=256, input_len=512,
                       samples_per_song=64, compute_dtype="bfloat16"),
    # "Fine Tune Params" (config.py:25-33)
    "fine_tune": SVSConfig(sample_rate=44100, hop_size=256, input_len=1536,
                           samples_per_song=16, learning_rate=5e-4,
                           compute_dtype="bfloat16", remat=True),
    # "1207 Params" (config.py:35-44)
    "p1207": SVSConfig(sample_rate=44100, hop_size=768, input_len=512,
                       samples_per_song=64, learning_rate=1e-4,
                       compute_dtype="bfloat16"),
    # "1209 Params" — the reference's ACTIVE preset (config.py:46-51)
    "default": SVSConfig(compute_dtype="bfloat16"),
    # INTENTIONAL EXTENSION (no reference counterpart): the scaled-up
    # flagship — 8x channel width (~630M params vs the stock 9.6M).
    # Measured on the v5e (scripts/bench_wide.py, ROUND_NOTES r5): B=32
    # still fits naively (9.2 GiB projected peak, 116 ms/step bf16), but
    # the activation temps grow with batch until the compiler's own memory
    # analysis passes the 16-GiB chip (B=256 projects 15.4 GiB = 96% HBM;
    # B=512 projects past it) — there gradient accumulation is REQUIRED
    # (micro-batch 32 holds a constant 11.5-GiB working set at ANY global
    # batch), and on a mesh pure-DP replication parks 9.4 GiB of states on
    # EVERY chip where ZeRO-1/FSDP shard them 8-way (per-device residency
    # table, same script --mesh).  remat ships OFF here: measured at wide
    # scale it saved almost no peak (XLA already schedules these temps)
    # and cost 20-25% step time — the stock-geometry win did not transfer.
    "wide": SVSConfig(enc_channels=(128, 256, 512, 1024, 2048, 4096),
                      compute_dtype="bfloat16"),
}


def get_config(preset: str = "default") -> SVSConfig:
    return PRESETS[preset]


# Module-level constants for reference CLI-default parity
# (star-imported in reference data.py:9 / train.py:10 / inference.py:7).
_cfg = PRESETS["default"]
WINDOW_SIZE = _cfg.window_size
HOP_SIZE = _cfg.hop_size
SAMPLE_RATE = _cfg.sample_rate
INPUT_LEN = _cfg.input_len
SAMPLES_PER_SONG = _cfg.samples_per_song


def num2str(n: int) -> str:
    """Zero-padded 4-digit index used in .npy file names (reference data.py:14-15)."""
    return str(n).zfill(4)
