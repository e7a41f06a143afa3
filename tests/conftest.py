"""Test config: run everything hermetically on a virtual 8-device CPU mesh.

This substitutes for the reference's missing multi-node test harness
(SURVEY.md §4): multi-device behavior (DP grads, BN stat pmean, metric psum)
is exercised via XLA's host-platform device-count override.
"""
import os

# Must be set before jax is imported anywhere. Force CPU even if the session
# environment preset a device platform (the real-chip benchmark lives in
# bench.py, not in the unit-test suite).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session environment force-registers the 'axon' TPU-tunnel platform even
# when JAX_PLATFORMS=cpu is exported, so pin it via the config API too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
