"""Honest (in-jit chained) measurements of gather BW and conv components."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp


def timeit_injit(fn, consts, x, iters=20):
    def loop(consts, x):
        def body(carry, _):
            return fn(consts, carry), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out
    f = jax.jit(loop)
    r = f(consts, x)
    jax.device_get(r.ravel()[0])
    t0 = time.perf_counter()
    r = f(consts, x)
    jax.device_get(r.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    n = 98304
    print("== in-jit gather: x[idx] for x [98304, C] bf16 ==")
    for c in (32, 96, 160, 256, 480, 512, 1280, 2048):
        idx = jax.random.randint(key, (n,), 0, n, jnp.int32)
        idx_near = jnp.clip(
            jnp.arange(n) + jax.random.randint(key, (n,), -2000, 2000),
            0, n - 1).astype(jnp.int32)
        x = jax.random.normal(key, (n, c), jnp.bfloat16)

        # chain: gather -> cheap update of x to keep dependency
        def g(idx, x):
            y = x[idx]
            return y * 0.999

        t1 = timeit_injit(g, idx, x)
        t2 = timeit_injit(g, idx_near, x)
        bw1 = n * c * 2 / t1 / 1e9
        bw2 = n * c * 2 / t2 / 1e9
        print(f"  C={c:5d}: rand {t1*1e3:6.2f} ms {bw1:6.1f} GB/s |"
              f" near {t2*1e3:6.2f} ms {bw2:6.1f} GB/s")

    print("== in-jit matmul [N,K]@[K,M] bf16 ==")
    for nn, k, m in ((98304, 32, 32), (98304, 96, 96), (98304, 96, 288),
                     (98304, 288, 96), (10880, 256, 256), (10880, 768, 256),
                     (19712, 384, 128)):
        x = jax.random.normal(key, (nn, k), jnp.bfloat16)
        w = jax.random.normal(key, (k, m), jnp.bfloat16)
        proj = jax.random.normal(key, (m, k), jnp.bfloat16)

        def mm(w, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return jnp.dot(y.astype(jnp.bfloat16), proj,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        t = timeit_injit(mm, w, x)
        fl = 2 * nn * k * m + 2 * nn * m * k
        print(f"  [{nn},{k}]x[{k},{m}] (+proj back): {t*1e3:6.3f} ms "
              f"{fl/t/1e12:6.2f} TF/s")

    print("== in-jit roll/concat W5 build [98304, 5C] ==")
    for c in (32, 96, 256):
        x = jax.random.normal(key, (n, c), jnp.bfloat16)

        def build(_, x):
            w5 = jnp.concatenate(
                [jnp.roll(x, 2, 0), jnp.roll(x, 1, 0), x,
                 jnp.roll(x, -1, 0), jnp.roll(x, -2, 0)], axis=1)
            return w5[:, c:2 * c] * 0.999

        t = timeit_injit(build, None, x)
        print(f"  C={c:4d}: {t*1e3:6.3f} ms ({n*c*2*10/t/1e9:6.1f} GB/s rw)")


if __name__ == "__main__":
    main()
