"""Probe: does Mosaic support tpu.dynamic_gather (via jnp.take_along_axis)
inside a Pallas kernel on this TPU, and how fast is it vs the one-hot matmul?

Variants:
  A. axis=0 (sublane) gather, [N, C] f32 and bf16
  B. axis=1 (lane) gather on the transposed layout
  C. timed loop: R repeated gathers in one kernel vs R one-hot dots

Run: python tools/perf/dyngather_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C = 512, 128


def gather0_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def gather1_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def run_gather(kernel, x, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def timed_kernel_gather(x_ref, idx_ref, o_ref, reps: int):
    def body(i, acc):
        g = jnp.take_along_axis(x_ref[:], idx_ref[:] + i, axis=0)
        return acc + g.astype(jnp.float32)
    o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros(x_ref.shape,
                                                          jnp.float32))


def timed_kernel_onehot(x_ref, idx_ref, o_ref, reps: int):
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)

    def body(i, acc):
        loc = idx_ref[:, 0] + i
        oh = (iota == loc[:, None]).astype(x_ref.dtype)
        g = jnp.dot(oh, x_ref[:], preferred_element_type=jnp.float32)
        return acc + g
    o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros(x_ref.shape,
                                                          jnp.float32))


def run_timed(kernel, x, idx, reps):
    return pl.pallas_call(
        functools.partial(kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def main():
    rng = np.random.default_rng(0)
    perm = rng.permutation(N).astype(np.int32)
    x32 = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
    xbf = x32.astype(jnp.bfloat16)
    idx0 = jnp.broadcast_to(jnp.asarray(perm)[:, None], (N, C))
    ref0 = np.asarray(x32)[perm]

    for name, x, idx, ref in [
        ("axis0_f32", x32, idx0, ref0),
        ("axis0_bf16", xbf, idx0, ref0),
        ("axis1_f32", x32.T[:, :N] if C >= N else jnp.asarray(
            rng.standard_normal((C, N)), jnp.float32), None, None),
    ]:
        try:
            if name.startswith("axis0"):
                out = np.asarray(run_gather(gather0_kernel, x, idx))
                ok = np.allclose(out, ref, atol=1e-2)
            else:
                xt = jnp.asarray(rng.standard_normal((8, N)), jnp.float32)
                idx1 = jnp.broadcast_to(jnp.asarray(perm)[None, :], (8, N))
                out = np.asarray(run_gather(gather1_kernel, xt, idx1))
                ok = np.allclose(out, np.asarray(xt)[:, perm], atol=1e-2)
            print(f"{name}: COMPILES ok={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")

    # timing: wrap-around safe indices (idx + i may exceed N -> clamp)
    idxs = jnp.broadcast_to(
        jnp.asarray(np.minimum(perm, N - 1 - 64))[:, None], (N, C))
    reps = 512
    for name, kern, x in [("timed_gather_bf16", timed_kernel_gather, xbf),
                          ("timed_gather_f32", timed_kernel_gather, x32),
                          ("timed_onehot_bf16", timed_kernel_onehot, xbf)]:
        try:
            f = jax.jit(lambda x, i, k=kern: run_timed(k, x, i, reps))
            f(x, idxs).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(10):
                r = f(x, idxs)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / 10
            per = dt / reps
            print(f"{name}: {dt*1e3:.3f} ms for {reps} gathers of "
                  f"[{N},{C}] -> {per*1e6:.2f} us/gather, "
                  f"{N/per/1e9:.2f} Grows/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
