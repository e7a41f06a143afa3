"""Persistent XLA compilation cache setup.

The big jitted train/eval steps take minutes to compile; enabling JAX's
persistent cache makes every process after the first start in seconds.
Called by the CLIs (train.py/infer.py/bench.py) before first compilation.
"""
from __future__ import annotations

import os

import jax


def honor_platform_env() -> None:
    """Pin the CPU platform when JAX_PLATFORMS=cpu is exported.

    The axon sitecustomize force-registers the TPU-tunnel platform even
    when the env var says cpu, so a config-API pin is required (same trick
    as tests/conftest.py and __graft_entry__.py). Lets every CLI run
    hermetically on CPU — e.g. while the tunnel is down (verify skill's
    outage fallback)."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # pragma: no cover
            pass


def enable_compilation_cache(path: str | None = None) -> None:
    honor_platform_env()
    cache_dir = path or os.environ.get(
        "OPENPCSEG_JAX_CACHE", os.path.expanduser("~/.cache/openpcseg_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax knob names
        pass
