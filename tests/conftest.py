"""Pytest config: run all tests on a simulated 8-device CPU mesh.

The axon TPU platform ignores the JAX_PLATFORMS env var, so we force the CPU
backend via jax.config (must happen before any backend is initialized). The
real TPU chip is reserved for bench.py (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Float64 available for finite-difference gradient checks (tests only; the
# library itself computes in fp32/bf16).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
