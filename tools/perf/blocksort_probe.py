"""Microbench: global lax.sort vs sort_keys_blocked at the real level sizes.

The downsample sorts process the FINE level's table (caps 98304 / 68864 /
37376 / 19712 at cap0=98304). Inputs are synthesized nearly-sorted with the
measured per-level max displacements (ROADMAP round-4 plan #2: 7.8k / 5.2k /
2.0k / 0.6k) so the blocked fast path is exercised, not the fallback.

  python tools/perf/blocksort_probe.py            # on TPU
  JAX_PLATFORMS=cpu python tools/perf/blocksort_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from openpcseg_tpu.utils.cache import pin_cpu_platform  # noqa: E402
pin_cpu_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from openpcseg_tpu.ops.coords import sort_keys_blocked  # noqa: E402

LEVELS = [(98304, 7800), (68864, 5200), (37376, 2000), (19712, 600)]
BLOCKS = [8192, 16384, 32768]
REPS = 50


def nearly_sorted(n: int, disp: int, seed: int):
    rng = np.random.default_rng(seed)
    base = np.sort(rng.integers(0, 1 << 40, size=n).astype(np.int64))
    pos = np.argsort(np.arange(n) + rng.uniform(0, disp, n))
    s = base[pos]
    return (jnp.asarray((s >> 20).astype(np.int32)),
            jnp.asarray((s & ((1 << 20) - 1)).astype(np.int32)))


def timeit(fn, *args):
    out = jax.jit(fn)(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        out = jax.jit(fn)(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / REPS * 1e3


def main():
    print(f"device: {jax.devices()[0]}")
    for n, disp in LEVELS:
        hi, lo = nearly_sorted(n, disp, seed=n)
        it = jnp.arange(n, dtype=jnp.int32)

        def full(h, l, i):
            return jax.lax.sort((h, l, i), num_keys=2)

        t_full = timeit(full, hi, lo, it)
        row = [f"n={n:6d} disp={disp:5d}  full {t_full:6.3f} ms"]
        for blk in BLOCKS:
            if n <= 2 * blk:
                row.append(f"blk{blk//1024}k —")
                continue

            def blocked(h, l, i, b=blk):
                return sort_keys_blocked(h, l, i, b)

            t = timeit(blocked, hi, lo, it)
            row.append(f"blk{blk//1024}k {t:6.3f}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
