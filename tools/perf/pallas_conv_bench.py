"""Pallas window conv vs XLA window conv on TPU: parity + in-jit timing.

Uses the real geometry of a raycast scan (realistic kmaps/spreads).
Run: python tools/perf/pallas_conv_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openpcseg_tpu.utils.cache import enable_compilation_cache


def timeit_injit(fn, x, iters=20):
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
    from openpcseg_tpu.data.raycast import raycast_batch
    from openpcseg_tpu.engine import SegTask
    from openpcseg_tpu.ops.kmap import kernel_offsets
    from openpcseg_tpu.ops.sparse_conv import window_subm_conv
    import openpcseg_tpu.ops.pallas_conv as pc
    from tools.perf.phase_profile import mk_cfgs

    print("device:", jax.devices()[0])
    task = SegTask(mk_cfgs(98304), num_class=20, batch_per_device=1,
                   iters_per_epoch=100, compute_dtype=jnp.bfloat16)
    bd = {k: jnp.asarray(v)
          for k, v in raycast_batch(0, 1, cap=131072).items()}
    vb, pyr = jax.jit(task.preprocess)(bd)
    offs = kernel_offsets(3)
    rng = np.random.default_rng(0)

    import os
    levels = os.environ.get("PB_LEVELS", "0:32,1:64,2:128,3:256,0:96")
    cases = [(int(a), int(b)) for a, b in
             (x.split(":") for x in levels.split(","))]
    for li, c in cases:
        cin = cout = c
        level = pyr.levels[li]
        kmap = level.subm_kmap
        n = kmap.shape[1]
        feats = jnp.asarray(
            rng.normal(size=(n, cin)), jnp.bfloat16)
        W = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)
        valid = level.valid

        plan = jax.jit(lambda km: pc.build_window_plan(
            km, pc._plan_key(offs)))(kmap)
        ovf = bool(jax.device_get(plan["overflow"]))
        wmax = int(jax.device_get(plan["wcnt"]).max())
        wmean = float(jax.device_get(plan["wcnt"]).mean())

        ref = jax.jit(lambda f: window_subm_conv(
            f, W, kmap, valid, offs, compute_dtype=jnp.bfloat16))(feats)
        got = jax.jit(lambda f: pc.pallas_window_subm_conv(
            f, W, kmap, valid, offs, compute_dtype=jnp.bfloat16))(feats)
        r = np.asarray(jax.device_get(ref), np.float32)
        g = np.asarray(jax.device_get(got), np.float32)
        scale = np.abs(r).max() + 1e-6
        err = np.abs(r - g).max() / scale
        print(f"L{li} n={n} c={cin}->{cout}: overflow={ovf} "
              f"wcnt max={wmax} mean={wmean:.2f} rel_err={err:.4f}")

        # in-jit fwd timing: conv output fed back via a 1x1 projection
        proj = jnp.asarray(rng.normal(size=(cout, cin)) * 0.1, jnp.bfloat16)

        def step_ref(f):
            o = window_subm_conv(f, W, kmap, valid, offs,
                                 compute_dtype=jnp.bfloat16)
            return (o.astype(jnp.bfloat16) @ proj)

        def step_pal(f):
            o = pc.pallas_window_subm_conv(f, W, kmap, valid, offs,
                                           compute_dtype=jnp.bfloat16)
            return (o.astype(jnp.bfloat16) @ proj)

        t_ref = timeit_injit(step_ref, feats)
        t_pal = timeit_injit(step_pal, feats)
        print(f"    fwd: xla {t_ref:.2f} ms  pallas {t_pal:.2f} ms "
              f"({t_ref / max(t_pal, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
