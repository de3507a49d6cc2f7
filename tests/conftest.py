"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on host-platform virtual devices
(SURVEY.md section 4: the reference had no distributed tests at all; we
simulate an 8-chip mesh on CPU).  Set RAG_SNVBERT_TEST_TPU=1 to run the
suite against real devices instead.
"""

import os

if not os.environ.get("RAG_SNVBERT_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

# The axon TPU plugin registers even under JAX_PLATFORMS=cpu; pin the
# default device to a host CPU so tests are fast and deterministic.  The
# 8 virtual CPU devices remain available for mesh tests, and
# RAG_SNVBERT_TEST_TPU=1 lifts the pin to exercise real hardware.
if not os.environ.get("RAG_SNVBERT_TEST_TPU"):
    import jax

    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
