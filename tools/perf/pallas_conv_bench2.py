"""Pallas vs XLA window conv on pre-dumped kmaps (fast iteration).

First run /tmp/dump_kmaps.py (or any script that saves kmap{i}/valid{i}
to /tmp/kmaps.npz), then:
    PB_CASES=2:128,3:256 python tools/perf/pallas_conv_bench2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openpcseg_tpu.utils.cache import enable_compilation_cache


def timeit_injit(fn, x, iters=10):
    def loop(x):
        def body(carry, _):
            return fn(carry), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out
    f = jax.jit(loop)
    r = f(x)
    jax.device_get(np.asarray(r.ravel()[0]))
    t0 = time.perf_counter()
    r = f(x)
    jax.device_get(np.asarray(r.ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compilation_cache()
    from openpcseg_tpu.ops.kmap import kernel_offsets
    from openpcseg_tpu.ops.sparse_conv import window_subm_conv
    import openpcseg_tpu.ops.pallas_conv as pc

    print("device:", jax.devices()[0],
          f"BLK={pc.BLK} WIN={pc.WIN} NW={pc.NW}")
    z = np.load("/tmp/kmaps.npz")
    offs = kernel_offsets(3)
    rng = np.random.default_rng(0)
    cases = [(int(a), int(b)) for a, b in
             (x.split(":") for x in
              os.environ.get("PB_CASES", "2:128").split(","))]

    for li, c in cases:
        kmap = jnp.asarray(z[f"kmap{li}"])
        valid = jnp.asarray(z[f"valid{li}"])
        n = kmap.shape[1]
        feats = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        W = jnp.asarray(rng.normal(size=(27, c, c)) * 0.1, jnp.float32)

        plan = jax.jit(lambda km: pc.build_window_plan(
            km, pc._plan_key(offs)))(kmap)
        ovf = bool(jax.device_get(plan["overflow"]))
        wmean = float(jax.device_get(plan["wcnt"]).mean())

        ref = jax.jit(lambda f: window_subm_conv(
            f, W, kmap, valid, offs, compute_dtype=jnp.bfloat16))(feats)
        got = jax.jit(lambda f: pc.pallas_window_subm_conv(
            f, W, kmap, valid, offs, compute_dtype=jnp.bfloat16))(feats)
        r = np.asarray(jax.device_get(ref), np.float32)
        g = np.asarray(jax.device_get(got), np.float32)
        err = np.abs(r - g).max() / (np.abs(r).max() + 1e-6)
        print(f"L{li} n={n} c={c}: overflow={ovf} wmean={wmean:.2f} "
              f"rel_err={err:.4f}", flush=True)

        proj = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.bfloat16)

        def step_ref(f):
            o = window_subm_conv(f, W, kmap, valid, offs,
                                 compute_dtype=jnp.bfloat16)
            return (o.astype(jnp.bfloat16) @ proj)

        def step_pal(f):
            o = pc.pallas_window_subm_conv(f, W, kmap, valid, offs,
                                           compute_dtype=jnp.bfloat16)
            return (o.astype(jnp.bfloat16) @ proj)

        t_pal = timeit_injit(step_pal, feats)
        t_ref = timeit_injit(step_ref, feats)
        print(f"    fwd: xla {t_ref:.2f} ms  pallas {t_pal:.2f} ms "
              f"({t_ref / max(t_pal, 1e-9):.1f}x)", flush=True)


if __name__ == "__main__":
    main()
