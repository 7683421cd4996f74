"""Test harness: force an 8-device virtual CPU mesh before jax import.

This is the TPU-native analog of a fake distributed backend: sharding and
collective tests run on 8 virtual CPU devices
(`--xla_force_host_platform_device_count=8`), per SURVEY.md §4.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize imports jax and registers the single-chip TPU
# backend at interpreter startup, so JAX_PLATFORMS set here would be too
# late; the config update below wins because backends resolve lazily.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
