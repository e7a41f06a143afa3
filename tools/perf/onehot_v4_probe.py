"""Probe v4: the v3 column-window unit — one unmasked one-hot, w3 gather
dot (3C lanes), 2D-constructed bf16 masks multiplied on dot-result slice
READS (no sub-128-lane scratch writes), 3 small weight dots.

Expected from pass-counting: C=32 unit ~3us probe-units vs CAL 8.12
(gather dot 16 MXU passes vs 48).
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
REPS = int(__import__("os").environ.get("PROBE_REPS", 256))
f32 = jnp.float32
bf = jnp.bfloat16


def kern_v3(loc_ref, bits_ref, w3_ref, wm_ref, w0_ref, wp_ref, o_ref,
            acc_ref, oh_ref, *, c, cout):
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(r, _):
        loc = loc_ref[0, :] + (r & 7)
        bits2 = bits_ref[0, :][:, None]                  # [BLK, 1] int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
        oh_ref[:] = (iota == loc[:, None]).astype(bf)
        g = jnp.dot(oh_ref[:], w3_ref[:],
                    preferred_element_type=f32).astype(bf)   # [BLK, 3C]
        s0, s1, s2 = g[:, 0:c], g[:, c:2 * c], g[:, 2 * c:3 * c]
        a0 = ((bits2 & 1) > 0).astype(bf)
        a1 = ((bits2 & 2) > 0).astype(bf)
        b1 = ((bits2 & 4) > 0).astype(bf)
        c1 = ((bits2 & 8) > 0).astype(bf)
        c2 = ((bits2 & 16) > 0).astype(bf)
        gm = s0 * a0 + s1 * a1
        g0 = s1 * b1
        gp = s1 * c1 + s2 * c2
        acc_ref[:] += jnp.dot(gm, wm_ref[:], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g0, w0_ref[:], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(gp, wp_ref[:], preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[:] = acc_ref[:]


def kern_dotonly(loc_ref, bits_ref, w3_ref, wm_ref, w0_ref, wp_ref, o_ref,
                 acc_ref, oh_ref, *, c, cout):
    """Gather dot alone (one-hot hoisted, no masks/weight dots): the floor."""
    acc_ref[:] = jnp.zeros_like(acc_ref)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
    oh_ref[:] = (iota == loc_ref[0, :][:, None]).astype(bf)

    def body(r, _):
        g = jnp.dot(oh_ref[:], w3_ref[:],
                    preferred_element_type=f32).astype(bf)
        acc_ref[:] += jnp.dot(g[:, 0:c], wm_ref[:],
                              preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[:] = acc_ref[:]


def run(kern, c, cout, name):
    rng = np.random.default_rng(0)
    loc = jnp.asarray(
        np.sort(rng.integers(0, WIN - 8, BLK)).astype(np.int32))[None]
    bits = jnp.asarray(rng.integers(1, 31, BLK).astype(np.int32))[None]
    w3 = jnp.asarray(rng.standard_normal((WIN, 3 * c)), bf)
    ws = [jnp.asarray(rng.standard_normal((c, cout)), bf) for _ in range(3)]
    f = pl.pallas_call(
        functools.partial(kern, c=c, cout=cout),
        out_shape=jax.ShapeDtypeStruct((BLK, cout), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLK, cout), f32),
                        pltpu.VMEM((BLK, WIN), bf)],
    )
    jf = jax.jit(lambda *a: f(*a))
    try:
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jf(loc, bits, w3, *ws)))
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            r = jf(loc, bits, w3, *ws)
        np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0) / n / REPS
        print(f"{name}: {dt*1e6:.2f} us/column-window "
              f"(compile {compile_t:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    run(kern_v3, 32, 32, "V3_C32")
    run(kern_dotonly, 32, 32, "V3floor_C32")
    run(kern_v3, 96, 96, "V3_C96")
    run(kern_v3, 64, 64, "V3_C64")


if __name__ == "__main__":
    main()
