"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The container wires JAX to a tunneled TPU backend ("axon") via sitecustomize,
which overrides the JAX_PLATFORMS env var. We force the CPU backend through
jax.config *after* import (before any device is touched) so the test suite is
hermetic, fast, and exercises the multi-device sharding paths via
``--xla_force_host_platform_device_count=8``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
