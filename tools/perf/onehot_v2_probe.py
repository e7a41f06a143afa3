"""Probe: one-hot gather-dot formulations for sparse-conv kernel v2.

Per column-window unit of work (BLK=512 outputs, WIN=512 window rows):
  A. round-2 style: 3 slot one-hots -> one [3*BLK, WIN] @ [WIN, C] dot
     + 3 weight dots [BLK, C] @ [C, C]  (C = 32)
  B. v2: ONE one-hot -> [BLK, WIN] @ [WIN, 3C] w3 gather + 5-lane-group
     mask multiply + one [BLK, 5C] @ [5C, Cout] weight dot
  C. v2 with f32 one-hot (relayout probe)
  D. v2-nomask: B without the mask multiplies (isolates VPU cost)

Each kernel loops REPS column-windows into a float32 accumulator, mimicking
the production kernel's dependency structure. Also retries the dynamic
gather lowering once (axis0) to rule out a flaky remote compile.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512
WIN = 512
C = 32
COUT = 32
REPS = 256


def kern_a(loc_ref, bits_ref, w3_ref, w_ref, o_ref, acc_ref, oh_ref):
    f32 = jnp.float32
    acc_ref[:] = jnp.zeros_like(acc_ref)
    win = w3_ref[:, :WIN].T  # [WIN, C] view; w3_ref [C? ...]

    def body(r, _):
        loc = loc_ref[0, :] + (r & 7)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
        cdt = jnp.bfloat16
        oh_ref[0:BLK, :] = (iota == loc[:, None]).astype(cdt)
        oh_ref[BLK:2 * BLK, :] = (iota == (loc - 1)[:, None]).astype(cdt)
        oh_ref[2 * BLK:3 * BLK, :] = (iota == (loc + 1)[:, None]).astype(cdt)
        g = jnp.dot(oh_ref[:], w3_ref[0:WIN, 0:C],
                    preferred_element_type=f32).astype(cdt)
        acc_ref[:] += jnp.dot(g[0:BLK], w_ref[0:C],
                              preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g[BLK:2 * BLK], w_ref[C:2 * C],
                              preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g[2 * BLK:3 * BLK], w_ref[2 * C:3 * C],
                              preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[:] = acc_ref[:]


def kern_b(loc_ref, bits_ref, w3_ref, w5_ref, o_ref, acc_ref, oh_ref,
           v5_ref, *, use_mask=True, oh_dtype=jnp.bfloat16):
    f32 = jnp.float32
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(r, _):
        loc = loc_ref[0, :] + (r & 7)
        bits = bits_ref[0, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
        oh_ref[:] = (iota == loc[:, None]).astype(oh_dtype)
        g = jnp.dot(oh_ref[:], w3_ref[0:WIN, :],
                    preferred_element_type=f32)      # [BLK, 3C]
        cdt = jnp.bfloat16
        gc = g.astype(cdt)
        if use_mask:
            a0 = ((bits & 1) != 0).astype(cdt)[:, None]
            a1 = (((bits >> 1) & 1) != 0).astype(cdt)[:, None]
            b1 = (((bits >> 2) & 1) != 0).astype(cdt)[:, None]
            c1 = (((bits >> 3) & 1) != 0).astype(cdt)[:, None]
            c2 = (((bits >> 4) & 1) != 0).astype(cdt)[:, None]
            v5_ref[:, 0:C] = gc[:, 0:C] * a0
            v5_ref[:, C:2 * C] = gc[:, C:2 * C] * a1
            v5_ref[:, 2 * C:3 * C] = gc[:, C:2 * C] * b1
            v5_ref[:, 3 * C:4 * C] = gc[:, C:2 * C] * c1
            v5_ref[:, 4 * C:5 * C] = gc[:, 2 * C:3 * C] * c2
        else:
            v5_ref[:, 0:C] = gc[:, 0:C]
            v5_ref[:, C:2 * C] = gc[:, C:2 * C]
            v5_ref[:, 2 * C:3 * C] = gc[:, C:2 * C]
            v5_ref[:, 3 * C:4 * C] = gc[:, C:2 * C]
            v5_ref[:, 4 * C:5 * C] = gc[:, 2 * C:3 * C]
        acc_ref[:] += jnp.dot(v5_ref[:], w5_ref[:],
                              preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[:] = acc_ref[:]


def run(kern, scratches, w3_lanes, w_rows, name, **kw):
    rng = np.random.default_rng(0)
    loc = jnp.asarray(
        np.sort(rng.integers(0, WIN - 8, BLK)).astype(np.int32))[None]
    bits = jnp.asarray(rng.integers(1, 31, BLK).astype(np.int32))[None]
    w3 = jnp.asarray(rng.standard_normal((WIN, w3_lanes)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((w_rows, COUT)), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(kern, **kw) if kw else kern,
        out_shape=jax.ShapeDtypeStruct((BLK, COUT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratches,
    )
    jf = jax.jit(lambda *a: f(*a))
    try:
        jf(loc, bits, w3, w).block_until_ready()
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            r = jf(loc, bits, w3, w)
        np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0) / n / REPS
        print(f"{name}: {dt*1e6:.2f} us/column-window")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def retry_dyngather():
    def gather0_kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((512, 128)),
                    jnp.float32)
    idx = jnp.broadcast_to(
        jnp.asarray(np.random.default_rng(2).permutation(512).astype(
            np.int32))[:, None], (512, 128))
    try:
        out = pl.pallas_call(
            gather0_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        print("dyngather retry: COMPILES",
              bool(np.allclose(np.asarray(out), np.asarray(x)[np.asarray(idx)[:, 0]])))
    except Exception as e:  # noqa: BLE001
        print(f"dyngather retry: FAIL {type(e).__name__}: {str(e)[:150]}")


def main():
    bf = jnp.bfloat16
    f32 = jnp.float32
    run(kern_a,
        [pltpu.VMEM((BLK, COUT), f32), pltpu.VMEM((3 * BLK, WIN), bf)],
        C, 3 * C, "A_round2_3slot_C32")
    run(kern_b,
        [pltpu.VMEM((BLK, COUT), f32), pltpu.VMEM((BLK, WIN), bf),
         pltpu.VMEM((BLK, 5 * C), bf)],
        3 * C, 5 * C, "B_v2_w3_bf16oh")
    run(kern_b,
        [pltpu.VMEM((BLK, COUT), f32), pltpu.VMEM((BLK, WIN), f32),
         pltpu.VMEM((BLK, 5 * C), bf)],
        3 * C, 5 * C, "C_v2_w3_f32oh", oh_dtype=jnp.float32)
    run(kern_b,
        [pltpu.VMEM((BLK, COUT), f32), pltpu.VMEM((BLK, WIN), bf),
         pltpu.VMEM((BLK, 5 * C), bf)],
        3 * C, 5 * C, "D_v2_nomask", use_mask=False)
    retry_dyngather()


if __name__ == "__main__":
    main()
