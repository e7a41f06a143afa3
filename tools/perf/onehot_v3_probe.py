"""Probe v3: isolate costs in the v2 one-hot window-conv formulation.

All kernels loop REPS column-windows into an f32 accumulator. Idle-CPU runs
only (concurrent host load corrupted probe v2's numbers).

  CAL  round-2 production shape: 3 mask-folded one-hots in a [3BLK, WIN]
       scratch, one gather dot [3BLK,WIN]@[WIN,C], 3 weight dots  (expect
       ~2.8 us from the round-2 end-to-end measurements)
  D2   v2 gather dot only: 1 one-hot, [BLK,WIN]@[WIN,3C], plain copy to
       v5 lanes, 1 weight dot [BLK,5C]@[5C,Cout]
  B2   D2 + where-folded masks (jnp.where(mask[:,None], x, 0))
  G    D2 with the one-hot built ONCE (hoisted): pure dot cost
  H    B2 but gather dot kept f32 end-to-end (no bf16 round trip)
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
REPS = int(__import__("os").environ.get("PROBE_REPS", 256))
f32 = jnp.float32
bf = jnp.bfloat16


def kern_cal(loc_ref, bits_ref, w3_ref, w_ref, o_ref, acc_ref, oh_ref):
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(r, _):
        loc = loc_ref[0, :] + (r & 7)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
        oh_ref[0:BLK, :] = (iota == loc[:, None]).astype(bf)
        oh_ref[BLK:2 * BLK, :] = (iota == (loc - 1)[:, None]).astype(bf)
        oh_ref[2 * BLK:3 * BLK, :] = (iota == (loc + 1)[:, None]).astype(bf)
        g = jnp.dot(oh_ref[:], w3_ref[:, 0:C],
                    preferred_element_type=f32).astype(bf)
        acc_ref[:] += jnp.dot(g[0:BLK], w_ref[0:C],
                              preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g[BLK:2 * BLK], w_ref[C:2 * C],
                              preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g[2 * BLK:3 * BLK], w_ref[2 * C:3 * C],
                              preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[:] = acc_ref[:]


def kern_v2(loc_ref, bits_ref, w3_ref, w5_ref, o_ref, acc_ref, oh_ref,
            v5_ref, *, masks="none", hoist=False, keep_f32=False):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    if hoist:
        iota0 = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
        oh_ref[:] = (iota0 == loc_ref[0, :][:, None]).astype(oh_ref.dtype)

    def body(r, _):
        loc = loc_ref[0, :] + (r & 7)
        bits = bits_ref[0, :]
        if not hoist:
            iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
            oh_ref[:] = (iota == loc[:, None]).astype(oh_ref.dtype)
        g = jnp.dot(oh_ref[:], w3_ref[:],
                    preferred_element_type=f32)      # [BLK, 3C]
        gc = g if keep_f32 else g.astype(bf)
        s0, s1, s2 = gc[:, 0:C], gc[:, C:2 * C], gc[:, 2 * C:3 * C]
        if masks == "where":
            a0 = (bits & 1) != 0
            a1 = ((bits >> 1) & 1) != 0
            b1 = ((bits >> 2) & 1) != 0
            c1 = ((bits >> 3) & 1) != 0
            c2 = ((bits >> 4) & 1) != 0
            z = jnp.zeros_like(s0)
            v5_ref[:, 0:C] = jnp.where(a0[:, None], s0, z)
            v5_ref[:, C:2 * C] = jnp.where(a1[:, None], s1, z)
            v5_ref[:, 2 * C:3 * C] = jnp.where(b1[:, None], s1, z)
            v5_ref[:, 3 * C:4 * C] = jnp.where(c1[:, None], s1, z)
            v5_ref[:, 4 * C:5 * C] = jnp.where(c2[:, None], s2, z)
        else:
            v5_ref[:, 0:C] = s0
            v5_ref[:, C:2 * C] = s1
            v5_ref[:, 2 * C:3 * C] = s1
            v5_ref[:, 3 * C:4 * C] = s1
            v5_ref[:, 4 * C:5 * C] = s2
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
    w3 = jnp.asarray(rng.standard_normal((WIN, w3_lanes)), bf)
    w = jnp.asarray(rng.standard_normal((w_rows, COUT)), bf)
    f = pl.pallas_call(
        functools.partial(kern, **kw) if kw else kern,
        out_shape=jax.ShapeDtypeStruct((BLK, COUT), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratches,
    )
    jf = jax.jit(lambda *a: f(*a))
    try:
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jf(loc, bits, w3, w)))
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            r = jf(loc, bits, w3, w)
        np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0) / n / REPS
        print(f"{name}: {dt*1e6:.2f} us/column-window "
              f"(compile {compile_t:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    import os
    only_cal = os.environ.get("PROBE_ONLY_CAL")
    run(kern_cal,
        [pltpu.VMEM((BLK, COUT), f32), pltpu.VMEM((3 * BLK, WIN), bf)],
        C, 3 * C, "CAL_round2_shape")
    if only_cal:
        return
    common = [pltpu.VMEM((BLK, COUT), f32), pltpu.VMEM((BLK, WIN), bf),
              pltpu.VMEM((BLK, 5 * C), bf)]
    run(kern_v2, common, 3 * C, 5 * C, "D2_v2_nomask", masks="none")
    run(kern_v2, common, 3 * C, 5 * C, "B2_v2_wheremask", masks="where")
    run(kern_v2, common, 3 * C, 5 * C, "G_v2_hoisted_oh", masks="none",
        hoist=True)
    run(kern_v2,
        [pltpu.VMEM((BLK, COUT), f32), pltpu.VMEM((BLK, WIN), bf),
         pltpu.VMEM((BLK, 5 * C), f32)],
        3 * C, 5 * C, "H_v2_f32_v5", masks="where", keep_f32=True)


if __name__ == "__main__":
    main()
