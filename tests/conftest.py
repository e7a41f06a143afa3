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

# Persistent XLA compile cache: the e2e model tests cost minutes of XLA CPU
# compilation on a 1-core box; cached re-runs start in seconds (measured
# 2.4s -> 1.3s on a toy graph; e2e graphs amortize far more). Keyed by HLO,
# so source changes that alter the graph recompile automatically.
_cache_dir = os.environ.get("OPENPCSEG_TEST_CACHE",
                            os.path.expanduser("~/.cache/openpcseg_jax_cpu"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
