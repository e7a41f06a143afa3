from __future__ import annotations
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import jax, jax.numpy as jnp
from w3win_proto import marginal_time

key = jax.random.PRNGKey(0)
print("device:", jax.devices()[0])
n, c = 98304, 96
feats = jax.random.normal(key, (n, c), jnp.bfloat16)
zm1 = (jax.random.uniform(key, (n,)) < 0.15).astype(jnp.bfloat16)

def build(_, x):
    zero = jnp.zeros((1, c), x.dtype)
    fm = jnp.concatenate([zero, x[:-1]], axis=0)
    fp = jnp.concatenate([x[1:], zero], axis=0)
    z = jnp.zeros((n, c), x.dtype)
    a0 = jnp.concatenate([fm * zm1[:, None], x, fp * zm1[:, None]], axis=1)
    ap = jnp.concatenate([fm * zm1[:, None], z, x], axis=1)
    am = jnp.concatenate([x, z, fp * zm1[:, None]], axis=1)
    X = jnp.concatenate([a0, ap, am], axis=0)
    return X[:n, :c] * 0.999

t = marginal_time(build, (None, feats))
print(f"X build [3N,3C] @96: {t*1e3:6.2f} ms")

# prebuilt table gathers: vary table rows M and width W
for m, w, ng in ((3*n, 288, 8), (3*n, 384, 8), (n, 288, 8), (3*n, 96, 8), (n, 96, 26), (3*n, 288, 4)):
    X = jax.random.normal(key, (m, w), jnp.bfloat16)
    idxs = jax.random.randint(key, (ng, n), 0, m, jnp.int32)
    def gath(idxs, x):
        acc = jnp.zeros((n, w), jnp.float32)
        for k in range(ng):
            acc = acc + x[idxs[k]]
        return (x * 0.9999 + 0.0001 * acc[:m if m<=n else n].astype(x.dtype).sum() / 1e9).astype(x.dtype) if False else jnp.concatenate([acc[:1].astype(x.dtype), x[1:]], axis=0) if x.shape[1]==w and m==n else x.at[0].set(acc[0].astype(x.dtype))
    # simpler dependency: fold acc row 0 into table row 0
    def gath2(idxs, x):
        acc = jnp.zeros((n, w), jnp.float32)
        for k in range(ng):
            g = x[idxs[k]]
            acc = acc + g
        return x.at[0].set(acc[0].astype(x.dtype))
    t = marginal_time(gath2, (idxs, X))
    gb = ng * n * w * 2 / t / 1e9
    print(f"gather table[{m},{w}] x{ng}: {t*1e3:6.2f} ms  {gb:6.1f} GB/s ({t/ng/n*1e9:.2f} ns/row)")
