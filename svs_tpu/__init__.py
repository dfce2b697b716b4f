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


def _enable_persistent_compilation_cache() -> None:
    """XLA executables are cached on disk across processes (huge win on
    remote-compile TPU setups: 10s-10min per program -> ~0.2s reload).
    Opt out with SVS_TPU_NO_CACHE=1; relocate with SVS_TPU_CACHE_DIR."""
    import os

    if os.environ.get("SVS_TPU_NO_CACHE"):
        return
    cache_dir = os.environ.get(
        "SVS_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "svs_tpu",
                     "jax_cache"),
    )
    try:
        import jax

        # TPU-only: remote TPU compiles cost 20s-10min each, CPU compiles
        # cost seconds — and reloading CPU AOT blobs emits feature-mismatch
        # warnings (and could in principle SIGILL across machine types).
        # Decide from the CONFIGURED platform string, never from
        # jax.default_backend(): that would initialize the backend at import
        # time, locking the platform before callers can config-update it
        # (the only override that works on rigs where sitecustomize already
        # imported jax).
        platforms = (jax.config.jax_platforms
                     or os.environ.get("JAX_PLATFORMS", ""))
        if not platforms or "cpu" in platforms.lower():
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimisation, never a requirement
        pass


_enable_persistent_compilation_cache()
