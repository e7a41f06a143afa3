"""Persistent XLA compilation cache setup.

The big jitted train/eval steps take minutes to compile; enabling JAX's
persistent cache makes every process after the first start in seconds.
Called by the CLIs (train.py/infer.py/bench.py) before first compilation.
"""
from __future__ import annotations

import os

import jax


def _backend_initialized() -> bool:
    """True once a JAX backend exists. Private-API probe, centralized here
    and guarded so a JAX upgrade degrades to 'assume initialized' (the pin
    then becomes a no-op instead of crashing)."""
    try:
        from jax._src import xla_bridge
        return bool(xla_bridge._backends)
    except Exception:  # pragma: no cover - JAX internals moved
        return True


def pin_cpu_platform(n_devices: int | None = None) -> None:
    """Pin the CPU platform when JAX_PLATFORMS=cpu is exported.

    The axon sitecustomize force-registers the TPU-tunnel platform even
    when the env var says cpu, so a config-API pin is required (same trick
    as tests/conftest.py). Lets every CLI run hermetically on CPU — e.g.
    while the tunnel is down (verify skill's outage fallback).
    `n_devices` additionally forces a virtual CPU device count (multi-chip
    dry runs); both only take effect before backend initialization.
    """
    if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    if _backend_initialized():
        return
    if n_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover
        pass


def honor_platform_env() -> None:
    pin_cpu_platform()


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
