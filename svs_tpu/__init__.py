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


def _default_cache_dir() -> str:
    import os

    return os.environ.get(
        "SVS_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "svs_tpu",
                     "jax_cache"),
    )


def _set_cache_config(cache_dir: str) -> None:
    import os

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _enable_persistent_compilation_cache() -> None:
    """XLA executables are cached on disk across processes (huge win on
    remote-compile TPU setups: 10s-10min per program -> ~0.2s reload).
    Opt out with SVS_TPU_NO_CACHE=1; relocate with SVS_TPU_CACHE_DIR."""
    import os

    if os.environ.get("SVS_TPU_NO_CACHE"):
        return
    try:
        import jax

        # TPU-only: remote TPU compiles cost 20s-10min each, CPU compiles
        # cost seconds — and reloading CPU AOT blobs emits feature-mismatch
        # warnings (and could in principle SIGILL across machine types).
        # Decide from the CONFIGURED platform string, never from
        # jax.default_backend(): that would initialize the backend at import
        # time, locking the platform before callers can config-update it
        # (the only override that works on rigs where sitecustomize already
        # imported jax).  Rigs where nothing is configured fall through to
        # :func:`enable_compile_cache`, which the CLI entry points call once
        # the backend choice is final.
        platforms = (jax.config.jax_platforms
                     or os.environ.get("JAX_PLATFORMS", ""))
        if not platforms or "cpu" in platforms.lower():
            return
        _set_cache_config(_default_cache_dir())
    except Exception:  # cache is an optimisation, never a requirement
        pass


def enable_compile_cache(cache_dir=None) -> bool:
    """Enable the persistent XLA executable cache for the INITIALIZED
    backend; returns True when the cache is active.

    The import-time hook above must not touch the backend, so it acts only
    when ``JAX_PLATFORMS`` (env or config) is explicit — which misses the
    common remote-TPU case where sitecustomize registers the device plugin
    and nothing is configured.  CLI entry points call THIS instead, right
    before their first compile (and, for multi-host, after
    ``jax.distributed.initialize``): initializing the backend here costs
    nothing they weren't about to pay, and ``jax.default_backend()`` then
    names the real platform.  CPU stays uncached — compiles are cheap and
    reloading CPU AOT blobs across machine types risks SIGILL (see
    0d1e445).  ``SVS_TPU_NO_CACHE=1`` opts out; ``SVS_TPU_CACHE_DIR`` (or
    the ``cache_dir`` argument) relocates.  Measured on the axon v5e rig:
    a never-before-compiled train-step signature costs 38.9s remote compile
    in the first process and 3.8s (cache reload) in the next
    (docs/ROUND_NOTES round 4)."""
    import os

    if os.environ.get("SVS_TPU_NO_CACHE"):
        return False
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return True  # already configured (import hook, conftest, user)
        if jax.default_backend() == "cpu":
            return False
        _set_cache_config(cache_dir or _default_cache_dir())
        return True
    except Exception:  # cache is an optimisation, never a requirement
        return False


_enable_persistent_compilation_cache()
