"""No-stack w3win: gather [N,3C] raw window + 5 mask-multiplies consumer."""
from __future__ import annotations
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import jax, jax.numpy as jnp
from w3win_proto import marginal_time


def w3v4_conv(w3w, base, m5, feats):
    """base [8,N] int32; m5 [5,8,N] bf16 masks (a0,a1,b1,c1,c2)."""
    n, c = feats.shape
    zero = jnp.zeros((1, c), feats.dtype)
    fm = jnp.concatenate([zero, feats[:-1]], axis=0)
    fp = jnp.concatenate([feats[1:], zero], axis=0)
    w3 = jnp.concatenate([fm, feats, fp], axis=1)   # [N, 3C] raw

    # center column: exact via z-adjacency masks folded into m5[...,:] of a
    # pseudo-column 8 (here approximated by raw window * masks)
    out = jnp.dot(w3, w3w[0], preferred_element_type=jnp.float32)
    for k in range(8):
        g = w3[jnp.maximum(base[k], 0)]
        g0, g1, g2 = g[:, :c], g[:, c:2 * c], g[:, 2 * c:]
        a0, a1, b1, c1, c2 = (m5[i, k][:, None] for i in range(5))
        gg = jnp.concatenate(
            [g0 * a0 + g1 * a1, g1 * b1, g1 * c1 + g2 * c2], axis=1)
        out = out + jnp.dot(gg, w3w[k + 1], preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def main():
    from openpcseg_tpu.ops.sparse_conv import sparse_conv
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    shapes = [(98304, 32, 32), (98304, 4, 32), (98304, 96, 96), (98304, 128, 96),
              (68864, 96, 96), (68864, 32, 32), (37376, 64, 64),
              (19712, 128, 128), (10880, 256, 256), (19712, 384, 256)]
    for n, cin, cout in shapes:
        ks = jax.random.split(key, 6)
        feats = jax.random.normal(ks[0], (n, cin), jnp.bfloat16)
        base = jnp.clip(jnp.arange(n)[None, :] +
                        jax.random.randint(ks[1], (8, n), -2000, 2000),
                        0, n - 1).astype(jnp.int32)
        base = jnp.where(jax.random.uniform(ks[2], (8, n)) > 0.4, -1, base)
        m5 = (jax.random.uniform(ks[3], (5, 8, n)) < 0.5).astype(jnp.bfloat16)
        w3w = jax.random.normal(ks[4], (9, 3 * cin, cout), jnp.bfloat16) * 0.1
        w27 = jax.random.normal(ks[4], (27, cin, cout), jnp.bfloat16) * 0.1
        kmap = jnp.clip(jnp.arange(n)[None, :] +
                        jax.random.randint(ks[1], (27, n), -2000, 2000),
                        0, n - 1).astype(jnp.int32)
        kmap = jnp.where(jax.random.uniform(ks[2], (27, n)) > 0.4, -1, kmap)
        valid = jnp.ones((n,), bool)
        proj = jax.random.normal(ks[5], (cout, cin), jnp.bfloat16) * 0.1

        def w3_step(w3w, base, x):
            y = w3v4_conv(w3w, base, m5, x)
            return jnp.tanh(jnp.dot(y, proj, preferred_element_type=jnp.float32)).astype(x.dtype)

        def g_step(w27, kmap, x):
            y = sparse_conv(x, w27, kmap, valid, center=13, compute_dtype=jnp.bfloat16)
            return jnp.tanh(jnp.dot(y.astype(jnp.bfloat16), proj, preferred_element_type=jnp.float32)).astype(x.dtype)

        t_w3 = marginal_time(w3_step, (w3w, base, feats))
        t_g = marginal_time(g_step, (w27, kmap, feats))
        print(f"N={n:6d} {cin:3d}->{cout:3d}: w3v4 {t_w3*1e3:6.2f} ms vs "
              f"gather {t_g*1e3:6.2f} ms -> {t_g/t_w3:4.2f}x")


if __name__ == "__main__":
    main()
