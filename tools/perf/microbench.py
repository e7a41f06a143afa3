"""Round-2 perf microbenchmarks: pick the sparse-conv implementation.

Measures, on the real chip (axon) or CPU:
  1. per-level tile occupancy of a SemanticKITTI-like scan (TILE=2/4),
  2. XLA row-gather throughput vs row width,
  3. dense matmul throughput at conv shapes,
  4. candidate conv impls: gather (current), XLA tiled, conv_general_dilated.

Timing endpoints use jax.device_get (axon: block_until_ready can return
before execution completes — see bench.py).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def occupancy():
    from openpcseg_tpu.data.synthetic import synthetic_scan
    xyz, feats, labels = synthetic_scan(0, n_points=131072)
    print("== per-level occupancy (voxel 0.05m) ==")
    coords = np.floor(xyz / 0.05).astype(np.int64)
    for lvl in range(5):
        c = coords // (2 ** lvl)
        vox = np.unique(c, axis=0)
        n = len(vox)
        for tile in (2, 4):
            t = np.unique(vox // tile, axis=0)
            nt = len(t)
            occ = n / (nt * tile ** 3)
            print(f"  L{lvl}: vox={n:7d} tile{tile}: NT={nt:7d} "
                  f"occ={occ:.3f} cells={nt * tile**3:8d}")


def gather_bw():
    print("== row-gather GB/s (useful bytes) ==")
    n = 98304
    key = jax.random.PRNGKey(0)
    for c in (32, 64, 128, 256, 512, 2048):
        x = jnp.zeros((n, c), jnp.bfloat16)
        idx = jax.random.randint(key, (n,), 0, n, jnp.int32)
        idx_sorted = jnp.sort(idx)
        for name, ix in (("rand", idx), ("sorted", idx_sorted)):
            dt = timeit(lambda a, i: a[i], x, ix)
            gb = n * c * 2 / dt / 1e9
            print(f"  C={c:5d} {name:6s}: {dt*1e3:7.2f} ms  {gb:7.1f} GB/s")


def matmul_tflops():
    print("== dense matmul TFLOP/s bf16 ==")
    for n, cin, cout in ((98304, 32, 32), (98304, 96, 96), (19712, 128, 128),
                         (10880, 256, 256), (696320, 32, 32)):
        a = jnp.zeros((n, cin), jnp.bfloat16)
        w = jnp.zeros((cin, cout), jnp.bfloat16)
        dt = timeit(lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32), a, w)
        tf = 2 * n * cin * cout / dt / 1e12
        print(f"  [{n},{cin}]x[{cin},{cout}]: {dt*1e3:7.3f} ms  {tf:6.2f} TFLOP/s")


def conv_candidates():
    print("== conv impls: [NT,6,6,6,C] -> [NT,4,4,4,C] 27-point ==")
    for nt, c in ((8192, 32), (2048, 128), (512, 256)):
        ext = jnp.zeros((nt, 6, 6, 6, c), jnp.bfloat16)
        w27 = jnp.zeros((27, c, c), jnp.bfloat16)
        wk = jnp.zeros((3, 3, 3, c, c), jnp.bfloat16)
        flops = 2 * 27 * nt * 64 * c * c

        def xla_slices(g, w):
            out = jnp.zeros((nt, 4, 4, 4, c), jnp.float32)
            k = 0
            for dx in range(3):
                for dy in range(3):
                    for dz in range(3):
                        sl = g[:, dx:dx + 4, dy:dy + 4, dz:dz + 4, :]
                        out = out + jax.lax.dot_general(
                            sl.reshape(nt * 64, c), w[k],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).reshape(nt, 4, 4, 4, c)
                        k += 1
            return out

        def xla_conv(g, w):
            return jax.lax.conv_general_dilated(
                g, w, (1, 1, 1), "VALID",
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
                preferred_element_type=jnp.float32)

        dt1 = timeit(xla_slices, ext, w27, iters=10)
        dt2 = timeit(xla_conv, ext, wk, iters=10)
        print(f"  NT={nt} C={c}: slices {dt1*1e3:7.2f} ms ({flops/dt1/1e12:5.2f} TF/s)"
              f"  convnd {dt2*1e3:7.2f} ms ({flops/dt2/1e12:5.2f} TF/s)")


def gather_conv():
    print("== current gather conv at model shapes ==")
    from openpcseg_tpu.ops.sparse_conv import sparse_conv
    key = jax.random.PRNGKey(0)
    for n, cin, cout in ((98304, 32, 32), (98304, 96, 96),
                         (68864, 96, 96), (37376, 64, 64),
                         (19712, 128, 128), (10880, 256, 256)):
        feats = jnp.zeros((n, cin), jnp.bfloat16)
        w = jnp.zeros((27, cin, cout), jnp.bfloat16)
        kmap = jax.random.randint(key, (27, n), -1, n, jnp.int32)
        valid = jnp.ones((n,), bool)
        dt = timeit(
            lambda f, w, k, v: sparse_conv(
                f, w, k, v, center=13, compute_dtype=jnp.bfloat16),
            feats, w, kmap, valid, iters=10)
        flops = 2 * 27 * n * cin * cout
        gbytes = 27 * n * cin * 2 / 1e9
        print(f"  N={n:6d} {cin:3d}->{cout:3d}: {dt*1e3:7.2f} ms "
              f"({flops/dt/1e12:5.2f} TF/s, gathers {gbytes/dt:6.1f} GB/s)")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    occupancy()
    gather_bw()
    matmul_tflops()
    conv_candidates()
    gather_conv()
