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

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
