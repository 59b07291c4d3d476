"""Test config: force an 8-device virtual CPU mesh before JAX backends init.

Tests never touch the real TPU: this build's JAX registers the tunneled
'axon' TPU plugin at priority 400 and ignores the JAX_PLATFORMS env var, so
the platform must be forced through jax.config. Sharding tests run on
``xla_force_host_platform_device_count=8`` fake devices (SURVEY.md §4's
multi-host test recipe).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
