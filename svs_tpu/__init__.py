"""svs_tpu — TPU-native singing-voice-separation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the PyTorch
reference `zouyuoz/SVS-UNet-PyTorch` (see SURVEY.md):

- ``svs_tpu.ops``        on-device DSP primitives (STFT/iSTFT/magphase/framing,
                         Pallas fused kernels, resampling)
- ``svs_tpu.models``     functional U-Net (init/apply), torch-checkpoint import
- ``svs_tpu.losses``     masked-magnitude L1, weighted-L1, multi-resolution STFT
- ``svs_tpu.data``       WAV I/O, wav<->spectrogram prep, patch sampling pipeline
- ``svs_tpu.train``      single jitted train step, training loop, checkpoints
- ``svs_tpu.infer``      batched whole-song decode (wav-in -> wav-out in HBM)
- ``svs_tpu.evaluation`` BSS-eval (SDR/SIR/SAR/NSDR) metrics
- ``svs_tpu.parallel``   device mesh, data-parallel sharding, halo exchange
- ``svs_tpu.utils``      config presets, logging, visualization
- ``svs_tpu.cli``        CLI entry points preserving the reference's flag surface
"""

__version__ = "0.1.0"
