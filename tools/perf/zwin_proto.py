"""Prototype benchmark: z-window column-gather conv vs current gather conv.

Honest timing: K iterations chained inside ONE jit (lax.scan with a data
dependency) to amortize the ~1.7 ms per-dispatch overhead seen through the
axon tunnel.
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


def timeit_injit(fn, *args, iters=20):
    """Time fn by scanning it `iters` times inside one jit."""
    def loop(args):
        def body(carry, _):
            out = fn(*carry[:-1], carry[-1])
            return (*carry[:-1], out), None
        carry, _ = jax.lax.scan(body, args, None, length=iters)
        return carry[-1]

    # fn signature: fn(*args[1:], x) -> x-like
    f = jax.jit(loop)
    r = f(args)
    jax.device_get(r.ravel()[0])
    t0 = time.perf_counter()
    r = f(args)
    jax.device_get(r.ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_inputs(n, c, key, hit=0.3):
    ks = jax.random.split(key, 4)
    feats = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
    # column base rows: ~hit fraction valid, indices clustered near i
    base = jnp.clip(
        jnp.arange(n)[None, :]
        + jax.random.randint(ks[1], (8, n), -2000, 2000), 0, n - 1
    ).astype(jnp.int32)
    miss = jax.random.uniform(ks[2], (8, n)) > hit
    base = jnp.where(miss, -1, base)
    code = jax.random.randint(ks[3], (8, n), -1, 2).astype(jnp.int32)
    return feats, base, code


def zwin_conv(w5w, base, code, feats):
    """feats [N,C] -> out [N,Cout]; w5w: weights [9, 3C, Cout]."""
    n, c = feats.shape
    # W5 build: 4 shifted copies (z-adjacency masks omitted in the proto —
    # same cost as a real mask: one compare + where)
    def sh(k):
        return jnp.roll(feats, -k, axis=0)
    w5 = jnp.concatenate([sh(-2), sh(-1), feats, sh(1), sh(2)], axis=1)

    out = jnp.dot(w5[:, c:4 * c], w5w[0],
                  preferred_element_type=jnp.float32)
    for k in range(8):
        g = w5[jnp.maximum(base[k], 0)]
        g = jnp.where((base[k] >= 0)[:, None], g, 0)
        ck = code[k]
        g0 = g[:, 0:3 * c]
        g1 = g[:, c:4 * c]
        g2 = g[:, 2 * c:5 * c]
        gg = jnp.where((ck == 1)[:, None], g0,
                       jnp.where((ck == -1)[:, None], g2, g1))
        out = out + jnp.dot(gg, w5w[k + 1],
                            preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def gather_conv_ref(w27, kmap, feats):
    from openpcseg_tpu.ops.sparse_conv import sparse_conv
    n = feats.shape[0]
    return sparse_conv(feats, w27, kmap, jnp.ones((n,), bool),
                       center=13, compute_dtype=jnp.bfloat16
                       ).astype(feats.dtype)


def main():
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    shapes = [(98304, 32, 32), (98304, 96, 96), (68864, 96, 96),
              (37376, 64, 64), (19712, 128, 128), (10880, 256, 256)]
    for n, cin, cout in shapes:
        feats, base, code = make_inputs(n, cin, key)
        w5w = jax.random.normal(key, (9, 3 * cin, cout), jnp.bfloat16)
        w27 = jax.random.normal(key, (27, cin, cout), jnp.bfloat16)
        kmap = jnp.clip(
            jnp.arange(n)[None, :]
            + jax.random.randint(key, (27, n), -2000, 2000), 0, n - 1
        ).astype(jnp.int32)
        kmap = jnp.where(jax.random.uniform(key, (27, n)) > 0.3, -1, kmap)

        # same output width for a like-for-like chain: pad/project
        proj = jax.random.normal(key, (cout, cin), jnp.bfloat16)

        def zwin_step(w5w, base, code, x):
            return jnp.dot(zwin_conv(w5w, base, code, x), proj,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)

        def gath_step(w27, kmap, x):
            return jnp.dot(gather_conv_ref(w27, kmap, x), proj,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)

        t_z = timeit_injit(zwin_step, w5w, base, code, feats, iters=10)
        t_g = timeit_injit(gath_step, w27, kmap, feats, iters=10)
        flops = 2 * 27 * n * cin * cout
        print(f"N={n:6d} {cin:3d}->{cout:3d}: zwin {t_z*1e3:7.2f} ms "
              f"({flops/t_z/1e12:5.2f} TF/s)  gather {t_g*1e3:7.2f} ms "
              f"({flops/t_g/1e12:5.2f} TF/s)  speedup {t_g/t_z:4.2f}x")


if __name__ == "__main__":
    main()
