"""Probe Mosaic/Pallas gather options on TPU for the window-conv kernel.

Q1: does `in_ref[idx_vec]` (vectorized dynamic gather from VMEM) compile?
Q2: one-hot MXU gather throughput: staged [W, C] window x one-hot [B, W].
Q3: full-feats-in-VMEM one-hot conv sketch timing vs XLA row gather.

Run: python tools/perf/pallas_gather_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def q1_vector_gather(n=32768, c=32):
    """in_ref[idx] with a vector of indices."""
    def kern(idx_ref, x_ref, o_ref):
        o_ref[:] = x_ref[idx_ref[:], :]

    x = jnp.asarray(np.random.randn(n, c), jnp.bfloat16)
    idx = jnp.asarray(np.random.randint(0, n, size=(n,)), jnp.int32)
    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
        )
        out = jax.jit(f)(idx, x)
        ref = x[idx]
        ok = jnp.allclose(out.astype(jnp.float32), ref.astype(jnp.float32))
        ms = timed(jax.jit(f), idx, x)
        print(f"Q1 vector-gather: OK={bool(ok)} {ms:.2f} ms "
              f"({n * c * 2 / ms / 1e6:.1f} GB/s)")
    except Exception as e:
        print(f"Q1 vector-gather: UNSUPPORTED ({type(e).__name__}: "
              f"{str(e)[:200]})")


def q2_onehot_gather(n=98304, c=32, blk=512, win=1024):
    """Blocked one-hot gather: out[i] = x[idx[i]] with idx monotone.

    x lives WHOLE in VMEM (fits: all MinkUNet levels are <=8 MB); each
    output block takes an element-granular dynamic slice window
    x[start:start+win] and gathers it with a [blk, win] one-hot matmul on
    the MXU.
    """
    nb = n // blk

    def kern(idx_ref, x_ref, o_ref):
        b = pl.program_id(0)
        idx_blk = idx_ref[pl.ds(b * blk, blk)]        # [blk]
        start = jnp.minimum(idx_blk[0], n - win)
        window = x_ref[pl.ds(start, win), :]          # [win, c]
        loc = idx_blk - start
        iota = jax.lax.broadcasted_iota(jnp.int32, (blk, win), 1)
        oh = (iota == loc[:, None]).astype(jnp.bfloat16)
        o_ref[pl.ds(b * blk, blk), :] = jax.lax.dot(
            oh, window, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    x = jnp.asarray(np.random.randn(n, c), jnp.bfloat16)
    # monotone idx: sorted random (the window-conv base property)
    idx_np = np.sort(np.random.randint(0, n, size=(n,))).astype(np.int32)
    idx = jnp.asarray(idx_np)

    try:
        f = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # idx whole
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
        )
        out = jax.jit(f)(idx, x)
        # exact only where idx fell inside each block's window
        starts = np.minimum(idx_np.reshape(nb, blk)[:, 0], n - win)
        loc = idx_np.reshape(nb, blk) - starts[:, None]
        inwin = ((loc >= 0) & (loc < win)).reshape(-1)
        o_np = np.asarray(out.astype(jnp.float32))
        r_np = np.asarray(x[idx].astype(jnp.float32))
        ok = np.allclose(o_np[inwin], r_np[inwin])
        ms = timed(jax.jit(f), idx, x)
        print(f"Q2 onehot-gather blk={blk} win={win} c={c}: OK={bool(ok)} "
              f"cover={inwin.mean():.3f} {ms:.2f} ms "
              f"({n * c * 2 / ms / 1e6:.1f} GB/s-equiv)")
    except Exception as e:
        print(f"Q2 onehot-gather: FAILED ({type(e).__name__}: "
              f"{str(e)[:300]})")


def q0_xla_row_gather(n=98304, c=32):
    x = jnp.asarray(np.random.randn(n, c), jnp.bfloat16)
    idx = jnp.asarray(
        np.sort(np.random.randint(0, n, size=(n,))), jnp.int32)
    f = jax.jit(lambda x, i: x[i])
    ms = timed(f, x, idx)
    print(f"Q0 XLA row-gather n={n} c={c}: {ms:.2f} ms "
          f"({n * c * 2 / ms / 1e6:.1f} GB/s)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    q0_xla_row_gather()
    q1_vector_gather()
    q2_onehot_gather()
    q2_onehot_gather(c=128)
    q2_onehot_gather(blk=256, win=512)
