"""Probe: in-kernel dynamic row gather vs the one-hot MXU gather.

The v3 conv kernel (ops/pallas_conv.py) gathers [BLK] rows from a VMEM
window as oh[blk, win] @ win[win, 3C] — ~blk*win*3C MACs per item just to
move blk rows. If Mosaic's dynamic gather (jnp.take along sublanes) works
on this chip/jax version, a real gather would cut the conv fwd/bwd item
cost by the one-hot build + dot. This probe measures both on one window
shape; run on the real TPU:

    python tools/perf/gather_vs_onehot_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK, WIN, LANES = 512, 512, 128
REPS = 200  # loop inside the kernel to swamp launch overhead


def _onehot_kernel(loc_ref, win_ref, o_ref):
    def body(i, acc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
        oh = (iota == loc_ref[0, :][:, None]).astype(jnp.bfloat16)
        g = jnp.dot(oh, win_ref[:], preferred_element_type=jnp.float32)
        return acc + g

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((BLK, LANES),
                                                          jnp.float32))


def _gather_kernel(loc_ref, win_ref, o_ref):
    def body(i, acc):
        idx = jnp.broadcast_to(loc_ref[0, :][:, None], (BLK, LANES))
        g = jnp.take_along_axis(win_ref[:], idx, axis=0)
        return acc + g.astype(jnp.float32)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((BLK, LANES),
                                                          jnp.float32))


def run(kern, name):
    loc = jnp.asarray(
        np.random.default_rng(0).integers(0, WIN, (1, BLK)), jnp.int32)
    win = jnp.asarray(
        np.random.default_rng(1).normal(size=(WIN, LANES)), jnp.bfloat16)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((BLK, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = f(loc, win)
        jax.device_get(out)
    except Exception as e:  # noqa: BLE001 - probe reports and moves on
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(loc, win)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / (20 * REPS)
    print(f"{name}: {dt * 1e6:.3f} us/item")
    return out


def main():
    o1 = run(_onehot_kernel, "onehot-dot")
    o2 = run(_gather_kernel, "dynamic-gather")
    if o1 is not None and o2 is not None:
        ok = np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-2)
        print(f"match: {ok}")


if __name__ == "__main__":
    main()
