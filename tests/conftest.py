"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (the driver separately dry-runs the multichip path).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may pin jax_platforms (e.g. to a TPU plugin); the config
# update takes precedence over JAX_PLATFORMS.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
