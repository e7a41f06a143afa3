"""Stacked-variant window conv: 8 gathers, zero consumer selects."""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import jax, jax.numpy as jnp
from w3win_proto import marginal_time


def w3v2_conv(w3w, base3, zm1, zp1, zm2, zp2, feats):
    """base3 [8, N] pre-offset gather index into the [3N] stacked table
    (-1 = all-miss). zm1/zp1/zm2/zp2: [N] z-adjacency masks (delta 1/2)."""
    n, c = feats.shape
    zero = jnp.zeros((1, c), feats.dtype)
    fm = jnp.concatenate([zero, feats[:-1]], axis=0)   # f[i-1]
    fp = jnp.concatenate([feats[1:], zero], axis=0)    # f[i+1]
    z = jnp.zeros((n, c), feats.dtype)
    a0 = jnp.concatenate([fm * zm1[:, None], feats, fp * zp1[:, None]], axis=1)
    ap = jnp.concatenate([fm * zm2[:, None], z, feats], axis=1)
    am = jnp.concatenate([feats, z, fp * zp2[:, None]], axis=1)
    x = jnp.concatenate([a0, ap, am], axis=0)          # [3N, 3C]

    out = jnp.dot(a0, w3w[0], preferred_element_type=jnp.float32)
    for k in range(8):
        g = x[jnp.maximum(base3[k], 0)]
        g = jnp.where((base3[k] >= 0)[:, None], g, 0)
        out = out + jnp.dot(g, w3w[k + 1], preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def main():
    from openpcseg_tpu.ops.sparse_conv import sparse_conv
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    shapes = [(98304, 32, 32), (98304, 96, 96), (68864, 96, 96),
              (37376, 64, 64), (19712, 128, 128), (10880, 256, 256)]
    for n, cin, cout in shapes:
        ks = jax.random.split(key, 6)
        feats = jax.random.normal(ks[0], (n, cin), jnp.bfloat16)
        base = jnp.clip(jnp.arange(n)[None, :] +
                        jax.random.randint(ks[1], (8, n), -2000, 2000),
                        0, n - 1).astype(jnp.int32)
        case = jax.random.randint(ks[3], (8, n), 0, 3)
        base3 = base + n * case
        base3 = jnp.where(jax.random.uniform(ks[2], (8, n)) > 0.4, -1, base3)
        zm1 = (jax.random.uniform(ks[2], (n,)) < 0.15).astype(jnp.bfloat16)
        zp1, zm2, zp2 = zm1, zm1, zm1
        w3w = jax.random.normal(ks[4], (9, 3 * cin, cout), jnp.bfloat16) * 0.1
        w27 = jax.random.normal(ks[4], (27, cin, cout), jnp.bfloat16) * 0.1
        kmap = jnp.clip(jnp.arange(n)[None, :] +
                        jax.random.randint(ks[1], (27, n), -2000, 2000),
                        0, n - 1).astype(jnp.int32)
        kmap = jnp.where(jax.random.uniform(ks[2], (27, n)) > 0.4, -1, kmap)
        valid = jnp.ones((n,), bool)
        proj = jax.random.normal(ks[5], (cout, cin), jnp.bfloat16) * 0.1

        def w3_step(w3w, base3, x):
            y = w3v2_conv(w3w, base3, zm1, zp1, zm2, zp2, x)
            return jnp.tanh(jnp.dot(y, proj, preferred_element_type=jnp.float32)).astype(x.dtype)

        def g_step(w27, kmap, x):
            y = sparse_conv(x, w27, kmap, valid, center=13, compute_dtype=jnp.bfloat16)
            return jnp.tanh(jnp.dot(y.astype(jnp.bfloat16), proj, preferred_element_type=jnp.float32)).astype(x.dtype)

        t_w3 = marginal_time(w3_step, (w3w, base3, feats))
        t_g = marginal_time(g_step, (w27, kmap, feats))
        print(f"N={n:6d} {cin:3d}->{cout:3d}: fwd w3v2 {t_w3*1e3:6.2f} ms vs "
              f"gather {t_g*1e3:6.2f} ms -> {t_g/t_w3:4.2f}x")


if __name__ == "__main__":
    main()
