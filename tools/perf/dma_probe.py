"""Bisect the v3 runtime fault: minimal dynamic-offset window DMA kernels.

P1: DMA [WIN,128] from ANY input at STATIC offset -> out
P2: DMA at dynamic offset from scalar-prefetch
P3: P2 + traced-slot double buffer (2 windows per grid step)
P4: P3 + one-hot dot consuming the window
"""
import functools
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 512
L = 128


def p1_kernel(x_any, o_ref, buf, sem):
    d = pltpu.make_async_copy(x_any.at[pl.ds(256, WIN), :], buf, sem)
    d.start()
    d.wait()
    o_ref[:] = buf[:]


def p2_kernel(starts_ref, x_any, o_ref, buf, sem):
    s = pl.multiple_of(starts_ref[0], 8)
    d = pltpu.make_async_copy(x_any.at[pl.ds(s, WIN), :], buf, sem)
    d.start()
    d.wait()
    o_ref[:] = buf[:]


def p3_kernel(starts_ref, x_any, o_ref, buf2, sem2):
    def dma(slot, s):
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s, WIN), :], buf2.at[slot], sem2.at[slot])

    dma(0, pl.multiple_of(starts_ref[0], 8)).start()

    def body(i, acc):
        slot = i % 2
        @pl.when(i + 1 < 4)
        def _():
            dma((i + 1) % 2,
                pl.multiple_of(starts_ref[i + 1], 8)).start()
        dma(slot, pl.multiple_of(starts_ref[i], 8)).wait()
        return acc + jnp.sum(buf2[slot].astype(jnp.float32))

    tot = jax.lax.fori_loop(0, 4, body, jnp.float32(0))
    o_ref[:] = jnp.full_like(o_ref, tot)


def p4_kernel(starts_ref, loc_ref, x_any, o_ref, buf2, oh, sem2):
    # loc_ref is a VMEM input [1, WIN]
    def dma(slot, s):
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s, WIN), :], buf2.at[slot], sem2.at[slot])

    dma(0, pl.multiple_of(starts_ref[0], 8)).start()
    acc0 = jnp.zeros((WIN, L), jnp.float32)

    def body(i, acc):
        slot = i % 2
        @pl.when(i + 1 < 4)
        def _():
            dma((i + 1) % 2,
                pl.multiple_of(starts_ref[i + 1], 8)).start()
        dma(slot, pl.multiple_of(starts_ref[i], 8)).wait()
        iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, WIN), 1)
        oh[:] = (iota == loc_ref[0, :][:, None]).astype(jnp.bfloat16)
        return acc + jnp.dot(oh[:], buf2[slot],
                             preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(0, 4, body, acc0)


def p6_kernel(starts_ref, loc_ref, x_any, o_ref, buf2, oh, sem2):
    # grid of 4 blocks, blocked loc input + blocked out, per-step DMAs
    b = pl.program_id(0)

    def dma(slot, s):
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s, WIN), :], buf2.at[slot], sem2.at[slot])

    dma(0, pl.multiple_of(starts_ref[b, 0], 8)).start()
    acc0 = jnp.zeros((WIN, L), jnp.float32)

    def body(i, acc):
        slot = i % 2
        @pl.when(i + 1 < 2)
        def _():
            dma((i + 1) % 2,
                pl.multiple_of(starts_ref[b, i + 1], 8)).start()
        dma(slot, pl.multiple_of(starts_ref[b, i], 8)).wait()
        iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, WIN), 1)
        oh[:] = (iota == loc_ref[0, :][:, None]).astype(jnp.bfloat16)
        return acc + jnp.dot(oh[:], buf2[slot],
                             preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(0, 2, body, acc0)


def run(name, kern, nscalar, scratches, extra_in=0, grid=None):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4096, L)), jnp.bfloat16)
    starts = jnp.asarray([256, 512, 1024, 2048], jnp.int32)
    if grid:
        starts = jnp.asarray(
            np.arange(grid * 2, dtype=np.int32).reshape(grid, 2) * 256)
    loc = jnp.asarray(rng.integers(0, WIN, WIN).astype(np.int32))[None]
    try:
        if nscalar == 0:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((WIN, L), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratches,
            )
            out = f(x)
        else:
            ins = [pl.BlockSpec(memory_space=pl.ANY)]
            args = [starts]
            if extra_in:
                args = [starts, loc]
            ins2 = list(ins)
            args = [starts]
            if extra_in:
                ins2 = [pl.BlockSpec((1, WIN), lambda *a: (0, 0),
                                     memory_space=pltpu.VMEM)] + ins
                args = [starts, loc]
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(grid or 1,),
                in_specs=ins2,
                out_specs=pl.BlockSpec(
                    (WIN, L), lambda b, s: (b if grid else 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratches)
            dt = jnp.float32 if extra_in else jnp.bfloat16
            f = pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct(((grid or 1) * WIN, L), dt))
            out = f(*args, x)
        r = np.asarray(jax.device_get(out))
        print(f"{name}: OK sum={r.astype(np.float64).sum():.2f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    bf = jnp.bfloat16
    run("P1", p1_kernel, 0,
        [pltpu.VMEM((WIN, L), bf), pltpu.SemaphoreType.DMA(())])
    run("P2", p2_kernel, 1,
        [pltpu.VMEM((WIN, L), bf), pltpu.SemaphoreType.DMA(())])
    run("P3", p3_kernel, 1,
        [pltpu.VMEM((2, WIN, L), bf), pltpu.SemaphoreType.DMA((2,))])
    run("P4", p4_kernel, 1,
        [pltpu.VMEM((2, WIN, L), bf), pltpu.VMEM((WIN, WIN), bf),
         pltpu.SemaphoreType.DMA((2,))], extra_in=1)
    run("P6", p6_kernel, 1,
        [pltpu.VMEM((2, WIN, L), bf), pltpu.VMEM((WIN, WIN), bf),
         pltpu.SemaphoreType.DMA((2,))], extra_in=1, grid=4)


if __name__ == "__main__":
    main()
