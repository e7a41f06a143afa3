"""Probe v5: can a static unroll-by-2 with separate one-hot scratches let
Mosaic overlap the VPU one-hot build with the MXU gather dot?

Variants (all production v3 single-one-hot shape, BLK=512 WIN=512 C=32):
  A  prod     one oh buffer: build -> bigdot -> masks -> 3 small dots
  B  unroll2  two items/iter, oh_a/oh_b: build_a, bigdot_a, build_b,
              finish_a, bigdot_b, finish_b  (build_b independent of dot_a)
  C  dotonly  oh hoisted out of the loop: bigdot + masks + small dots
  D  buildonly loop builds one-hots only, single dot at the end

REPS>=4096 in-kernel reps (tunnel dispatch ~1.5 ms drowns smaller counts).
Run with an idle CPU.
"""
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
REPS = int(__import__("os").environ.get("PROBE_REPS", 4096))
f32 = jnp.float32
bf = jnp.bfloat16


def _masks(g, bits):
    bits2 = bits[:, None]
    a0 = ((bits2 & 1) > 0).astype(bf)
    a1 = ((bits2 & 2) > 0).astype(bf)
    b1 = ((bits2 & 4) > 0).astype(bf)
    c1 = ((bits2 & 8) > 0).astype(bf)
    c2 = ((bits2 & 16) > 0).astype(bf)
    s0, s1, s2 = g[:, 0:C], g[:, C:2 * C], g[:, 2 * C:3 * C]
    return s0 * a0 + s1 * a1, s1 * b1, s1 * c1 + s2 * c2


def _item(oh_ref, w3_ref, w_ref, acc_ref, bits, loc):
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
    oh_ref[:] = (iota == loc[:, None]).astype(bf)
    g = jnp.dot(oh_ref[:], w3_ref[0:WIN, :],
                preferred_element_type=f32).astype(bf)
    gm, g0, gp = _masks(g, bits)
    acc_ref[:] += jnp.dot(gm, w_ref[0:C], preferred_element_type=f32)
    acc_ref[:] += jnp.dot(g0, w_ref[C:2 * C], preferred_element_type=f32)
    acc_ref[:] += jnp.dot(gp, w_ref[2 * C:3 * C], preferred_element_type=f32)


def kern_a(loc_ref, bits_ref, w3_ref, w_ref, o_ref, acc_ref, oh_ref):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    bits = bits_ref[0, :]

    def body(r, _):
        loc = loc_ref[0, :] + (r & 7)
        _item(oh_ref, w3_ref, w_ref, acc_ref, bits, loc)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[:] = acc_ref[:]


def kern_b(loc_ref, bits_ref, w3_ref, w_ref, o_ref, acc_ref,
           oha_ref, ohb_ref):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    bits = bits_ref[0, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)

    def body(t, _):
        loc_a = loc_ref[0, :] + ((2 * t) & 7)
        loc_b = loc_ref[0, :] + ((2 * t + 1) & 7)
        oha_ref[:] = (iota == loc_a[:, None]).astype(bf)
        g_a = jnp.dot(oha_ref[:], w3_ref[0:WIN, :],
                      preferred_element_type=f32).astype(bf)
        # independent of g_a: Mosaic may schedule it under the MXU dot
        ohb_ref[:] = (iota == loc_b[:, None]).astype(bf)
        gm, g0, gp = _masks(g_a, bits)
        acc_ref[:] += jnp.dot(gm, w_ref[0:C], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g0, w_ref[C:2 * C], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(gp, w_ref[2 * C:3 * C],
                              preferred_element_type=f32)
        g_b = jnp.dot(ohb_ref[:], w3_ref[0:WIN, :],
                      preferred_element_type=f32).astype(bf)
        gm, g0, gp = _masks(g_b, bits)
        acc_ref[:] += jnp.dot(gm, w_ref[0:C], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g0, w_ref[C:2 * C], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(gp, w_ref[2 * C:3 * C],
                              preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, REPS // 2, body, 0)
    o_ref[:] = acc_ref[:]


def kern_c(loc_ref, bits_ref, w3_ref, w_ref, o_ref, acc_ref, oh_ref):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    bits = bits_ref[0, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
    loc = loc_ref[0, :]
    oh_ref[:] = (iota == loc[:, None]).astype(bf)

    def body(r, _):
        g = jnp.dot(oh_ref[:], w3_ref[0:WIN, :],
                    preferred_element_type=f32).astype(bf)
        gm, g0, gp = _masks(g, bits)
        acc_ref[:] += jnp.dot(gm, w_ref[0:C], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(g0, w_ref[C:2 * C], preferred_element_type=f32)
        acc_ref[:] += jnp.dot(gp, w_ref[2 * C:3 * C],
                              preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    o_ref[:] = acc_ref[:]


def kern_d(loc_ref, bits_ref, w3_ref, w_ref, o_ref, acc_ref, oh_ref):
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(r, _):
        loc = loc_ref[0, :] + (r & 7)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
        oh_ref[:] = (iota == loc[:, None]).astype(bf)
        return 0

    jax.lax.fori_loop(0, REPS, body, 0)
    g = jnp.dot(oh_ref[:], w3_ref[0:WIN, :],
                preferred_element_type=f32).astype(bf)
    acc_ref[:] += jnp.dot(g[:, 0:C], w_ref[0:C], preferred_element_type=f32)
    o_ref[:] = acc_ref[:]


def run(name, kern, n_oh):
    scratch = [pltpu.VMEM((BLK, COUT), f32)]
    scratch += [pltpu.VMEM((BLK, WIN), bf) for _ in range(n_oh)]
    rng = np.random.default_rng(0)
    loc = jnp.asarray(rng.integers(0, WIN - 8, size=(8, BLK)), jnp.int32)
    bits = jnp.asarray(rng.integers(1, 31, size=(8, BLK)), jnp.int32)
    w3 = jnp.asarray(rng.normal(size=(WIN + 8, 3 * C)), bf)
    w = jnp.asarray(rng.normal(size=(3 * C, COUT)), bf)
    fn = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLK, COUT), f32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
    )
    f = jax.jit(fn)
    r = f(loc, bits, w3, w)
    jax.device_get(np.asarray(r)[0, 0])
    t0 = time.perf_counter()
    r = f(loc, bits, w3, w)
    jax.device_get(np.asarray(r)[0, 0])
    dt = time.perf_counter() - t0
    print(f"{name:10s} {dt / REPS * 1e6:8.3f} us/unit  (total {dt*1e3:.1f} ms)")


if __name__ == "__main__":
    run("A prod", kern_a, 1)
    run("B unroll2", kern_b, 2)
    run("C dotonly", kern_c, 1)
    run("D buildonly", kern_d, 1)
