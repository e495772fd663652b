"""Test harness: run everything on a virtual 8-device CPU mesh.

The environment may pre-register a TPU backend at interpreter startup (via
sitecustomize), so env vars alone are not enough — jax.config is updated
explicitly before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
