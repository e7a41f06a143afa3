"""Prototype: Pallas TPU kernel for 2-key sorted-table lookup.

Table lives entirely in VMEM (cap ~196k x 8B = 1.6MB); queries stream in
blocks. Per-block vectorized binary search with per-lane dynamic gathers
from VMEM. Compare vs the pure-XLA binary search for correctness + speed.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpcseg_tpu.ops import unique_coords, make_keys, lookup_keys
from openpcseg_tpu.ops.coords import Keys, INT32_MAX


def lookup_kernel(th_ref, tl_ref, qh_ref, ql_ref, out_ref, *, t: int):
    qh = qh_ref[:]
    ql = ql_ref[:]
    nbits = max(1, (t - 1).bit_length())
    lo = jnp.zeros(qh.shape, jnp.int32)
    step = 1 << (nbits - 1)
    for _ in range(nbits):
        cand = lo + step
        ok = cand < t
        cand_c = jnp.minimum(cand, t - 1)
        th = jnp.take(th_ref[:], cand_c, axis=0)
        tl = jnp.take(tl_ref[:], cand_c, axis=0)
        le = (th < qh) | ((th == qh) & (tl <= ql))
        lo = jnp.where(ok & le, cand, lo)
        step >>= 1
    th = jnp.take(th_ref[:], lo, axis=0)
    tl = jnp.take(tl_ref[:], lo, axis=0)
    hit = (th == qh) & (tl == ql) & (qh != INT32_MAX)
    out_ref[:] = jnp.where(hit, lo, -1)


def pallas_lookup(table: Keys, qh, ql, block=4096):
    t = table.hi.shape[0]
    nq = qh.shape[0]
    assert nq % block == 0
    from functools import partial
    grid = (nq // block,)
    return pl.pallas_call(
        partial(lookup_kernel, t=t),
        out_shape=jax.ShapeDtypeStruct((nq,), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((t,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
    )(table.hi, table.lo, qh, ql)


def main():
    rng = np.random.default_rng(0)
    N = 262144
    CAP = 196608
    coords = np.concatenate([
        rng.integers(0, 2, (N, 1)), rng.integers(0, 3300, (N, 2)),
        rng.integers(0, 120, (N, 1))], 1).astype(np.int32)
    u = unique_coords(jnp.asarray(coords), jnp.ones(N, bool), CAP)

    # queries: neighbors (some hit some miss), 27x196k flattened
    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(-1, 3)
    tc = np.asarray(u.coords)
    q = np.concatenate([
        np.broadcast_to(tc[None, :, :1], (27, CAP, 1)),
        tc[None, :, 1:] + offs[:, None, :]], -1).reshape(-1, 4).astype(np.int32)
    qv = np.broadcast_to(np.asarray(u.valid)[None], (27, CAP)).reshape(-1)
    qk = make_keys(jnp.asarray(q), jnp.asarray(qv))

    # reference: XLA binary search
    f_xla = jax.jit(lambda t_hi, t_lo, qh, ql: lookup_keys(Keys(t_hi, t_lo), Keys(qh, ql)))
    r_xla = f_xla(u.keys.hi, u.keys.lo, qk.hi, qk.lo)
    jax.device_get(r_xla[0])

    f_pl = jax.jit(lambda t_hi, t_lo, qh, ql: pallas_lookup(Keys(t_hi, t_lo), qh, ql))
    try:
        r_pl = f_pl(u.keys.hi, u.keys.lo, qk.hi, qk.lo)
        ok = np.array_equal(np.asarray(r_pl), np.asarray(r_xla))
        print("pallas correctness:", ok, flush=True)
    except Exception as e:
        print("PALLAS FAILED:", type(e).__name__, str(e)[:2000], flush=True)
        return

    for name, f in [("xla", f_xla), ("pallas", f_pl)]:
        t0 = time.time()
        for _ in range(5):
            r = f(u.keys.hi, u.keys.lo, qk.hi, qk.lo)
        jax.device_get(r[0])
        print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms for 27x196k queries", flush=True)


if __name__ == "__main__":
    main()
