"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4) so data-parallel and
sharded-inference paths are exercised without TPU hardware.

Note: this image's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon already in the environment, so the env var is captured
before conftest can change it — ``jax.config.update`` is the reliable
override point.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# hide cpu_aot_loader's benign machine-feature ERROR wall on persistent-
# cache loads (pseudo tuning-features; same machine — see __graft_entry__)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
# persistent XLA compilation cache (shared with the driver dryrun): the
# suite compiles hundreds of 8-device GSPMD programs — cold that dominates
# the 75-90 min wall; warm reruns skip straight to execution
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
