"""enable_compile_cache: the CLI-side persistent-cache hook.

The import-time hook acts only on an explicit JAX_PLATFORMS; CLIs call
``svs_tpu.enable_compile_cache()`` once the backend choice is final so the
common nothing-configured remote-TPU rig gets the executable cache too
(svs_tpu/__init__.py).  These tests pin its decision table hermetically on
the CPU test platform.
"""

import jax
import pytest

import svs_tpu


@pytest.fixture
def _clear_cache_config():
    """Temporarily unset the suite's cache dir so the decision paths run."""
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_respects_existing_config():
    # conftest already set the suite cache dir -> True, dir untouched
    prev = jax.config.jax_compilation_cache_dir
    assert prev
    assert svs_tpu.enable_compile_cache() is True
    assert jax.config.jax_compilation_cache_dir == prev


def test_cpu_backend_stays_uncached(_clear_cache_config):
    assert jax.default_backend() == "cpu"
    assert svs_tpu.enable_compile_cache() is False
    assert jax.config.jax_compilation_cache_dir is None


def test_non_cpu_backend_enables(_clear_cache_config, monkeypatch, tmp_path):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    target = str(tmp_path / "xc")
    assert svs_tpu.enable_compile_cache(cache_dir=target) is True
    assert jax.config.jax_compilation_cache_dir == target
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("SVS_TPU_NO_CACHE", "1")
    assert svs_tpu.enable_compile_cache() is False
