"""Round 2 of the Mosaic gather probe: SMEM scalar-prefetch starts, 2-D idx.

Run: python tools/perf/pallas_gather_probe2.py
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


def timed(fn, *args, iters=30):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def onehot_gather(n=98304, c=32, blk=512, win=1024, sortidx=True):
    nb = n // blk

    def kern(starts_ref, idx_ref, x_ref, o_ref):
        b = pl.program_id(0)
        # starts are pre-aligned to 8 on the host side; multiple_of lets
        # Mosaic lower the dynamic sublane slice (unaligned crashes it)
        start = pl.multiple_of(starts_ref[b], 8)     # SMEM scalar
        idx_row = idx_ref[b, :]                      # [blk] lane vector
        window = x_ref[pl.ds(start, win), :]         # [win, c] from VMEM
        loc = idx_row - start
        # transposed one-hot: lane-vector broadcast is free; contract over
        # the sublane (window-row) dim on the MXU
        iota = jax.lax.broadcasted_iota(jnp.int32, (win, blk), 0)
        oh_t = (iota == loc[None, :]).astype(jnp.bfloat16)   # [win, blk]
        o_ref[:] = jax.lax.dot_general(
            oh_t, window, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    x = jnp.asarray(np.random.randn(n, c), jnp.bfloat16)
    idx_np = np.random.randint(0, n, size=(n,)).astype(np.int32)
    if sortidx:
        idx_np = np.sort(idx_np)
    starts_np = np.minimum(idx_np.reshape(nb, blk)[:, 0], n - win).astype(
        np.int32)
    starts_np = (starts_np // 8) * 8  # sublane alignment (see kernel)
    idx2 = jnp.asarray(idx_np.reshape(nb, blk))
    starts = jnp.asarray(starts_np)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # idx whole [nb, blk]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole in VMEM
        ],
        out_specs=pl.BlockSpec((blk, c), lambda b, s: (b, 0)),
    )
    try:
        f = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
        )
        out = jax.jit(f)(starts, idx2, x)
        loc = idx_np.reshape(nb, blk) - starts_np[:, None]
        inwin = ((loc >= 0) & (loc < win)).reshape(-1)
        o_np = np.asarray(out.astype(jnp.float32))
        r_np = np.asarray(x[jnp.asarray(idx_np)].astype(jnp.float32))
        ok = np.allclose(o_np[inwin], r_np[inwin])
        ms = timed(jax.jit(f), starts, idx2, x)
        print(f"onehot blk={blk} win={win} c={c}: OK={bool(ok)} "
              f"cover={inwin.mean():.3f} {ms:.2f} ms "
              f"({n * c * 2 / ms / 1e6:.1f} GB/s-equiv)")
    except Exception as e:
        print(f"onehot blk={blk} win={win} c={c}: FAILED "
              f"({type(e).__name__}: {str(e)[:400]})")


if __name__ == "__main__":
    print("devices:", jax.devices())
    onehot_gather()
    onehot_gather(c=128)
    onehot_gather(blk=256, win=512)
    onehot_gather(blk=1024, win=2048, c=32)
