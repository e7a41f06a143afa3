"""Probe: kmap key-lookup strategies on realistic mk34-L0 shapes.

The round-4 batch traces put the tree-search machinery (coords.py:202
node-row gathers + :241/:242 window gather/check) at ~24 ms/step — the
second-largest bucket after the conv kernels. Candidates measured here,
all on the SAME workload (table cap 98304, 8 shifted query streams like
build_subm_kmap's column searches):

  tree16 / tree32 / tree64   lookup_keys_z3 with node width 16/32/64
  flat<S>                    single-level tree: top brute-force compare
                             against ceil(cap/S) separators + ONE node-row
                             gather of S keys
  sortrank                   concat(table, queries) -> ONE lax.sort ->
                             cumsum/cummax rank trick -> scatter back to
                             query order (no gathers at all)

Run on the real TPU: python tools/perf/lookup_probe.py [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from openpcseg_tpu.ops.coords import (  # noqa: E402
    INT32_MAX, Keys, lookup_keys_z3)

CAP = 98304
NSTREAM = 8


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    # sorted unique packed keys with realistic local density (z-runs)
    base = np.sort(rng.choice(np.int64(CAP * 37), CAP, replace=False))
    hi = (base >> 15).astype(np.int32)
    lo = (base & 0x7FFF).astype(np.int32)
    table = Keys(jnp.asarray(hi), jnp.asarray(lo))
    # 8 shifted streams (like subm xy-column queries): key + c, saturated
    shifts = rng.integers(-4000, 4000, NSTREAM)
    qh = np.stack([hi for _ in shifts])
    ql = np.stack([np.clip(lo + c, 0, 0x7FFF).astype(np.int32)
                   for c in shifts])
    return table, Keys(jnp.asarray(qh), jnp.asarray(ql))


def time_fn(fn, *args, reps=8):
    out = fn(*args)
    jax.tree.map(jax.device_get, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(jax.device_get, out)
    return (time.perf_counter() - t0) / reps * 1e3


def tree(node):
    @jax.jit
    def f(table, q):
        return lookup_keys_z3(table, q, node=node)
    return f


def flat(span):
    nn = -(-CAP // span)

    @jax.jit
    def f(table, q):
        qh, ql = q.hi.reshape(-1), q.lo.reshape(-1)
        pad = nn * span - CAP
        th = jnp.pad(table.hi, (0, pad), constant_values=INT32_MAX)
        tl = jnp.pad(table.lo, (0, pad), constant_values=INT32_MAX)
        rows = jnp.concatenate(
            [th.reshape(nn, span), tl.reshape(nn, span)], axis=1)
        sep_h, sep_l = th.reshape(nn, span)[:, 0], tl.reshape(nn, span)[:, 0]
        le = (sep_h[None] < qh[:, None]) | (
            (sep_h[None] == qh[:, None]) & (sep_l[None] <= ql[:, None]))
        nd = jnp.maximum(jnp.sum(le.astype(jnp.int32), axis=1) - 1, 0)
        r = rows[nd]
        within = (r[:, :span] < qh[:, None]) | (
            (r[:, :span] == qh[:, None]) & (r[:, span:] <= ql[:, None]))
        pos = nd * span + jnp.maximum(
            jnp.sum(within.astype(jnp.int32), axis=1) - 1, 0)
        pos = jnp.minimum(pos, CAP - 1)
        # z3 hit-check via the same key-window gather the tree uses
        from openpcseg_tpu.ops.coords import _key_window
        w = _key_window(table)[pos]
        hits = []
        pm = jnp.maximum(pos - 1, 0)
        pp = jnp.minimum(pos + 1, CAP - 1)
        for d in (-1, 0, 1):
            tq = ql + d
            at0 = (w[:, 2] == qh) & (w[:, 3] == tq)
            atm = (w[:, 0] == qh) & (w[:, 1] == tq)
            atp = (w[:, 4] == qh) & (w[:, 5] == tq)
            idx = jnp.where(at0, pos, jnp.where(atm, pm,
                            jnp.where(atp, pp, -1)))
            hits.append(jnp.where(qh != INT32_MAX, idx, -1))
        return jnp.stack(hits).reshape((3,) + q.hi.shape).astype(jnp.int32)
    return f


@jax.jit
def sortrank(table, q):
    """Rank-by-sort: positions of all queries via ONE combined sort."""
    qh, ql = q.hi.reshape(-1), q.lo.reshape(-1)
    nq = qh.shape[0]
    # z3 = three shifted copies of each query
    qh3 = jnp.concatenate([qh, qh, qh])
    ql3 = jnp.concatenate([ql - 1, ql, ql + 1])
    n3 = 3 * nq
    ch = jnp.concatenate([table.hi, qh3])
    cl = jnp.concatenate([table.lo, ql3])
    # tag 0 = table (sorts before equal queries), payload = original slot
    tag = jnp.concatenate([jnp.zeros((CAP,), jnp.int32),
                           jnp.ones((n3,), jnp.int32)])
    slot = jnp.concatenate([jnp.zeros((CAP,), jnp.int32),
                            jnp.arange(n3, dtype=jnp.int32)])
    sh, sl, st, ss = jax.lax.sort((ch, cl, tag, slot), num_keys=3)
    is_table = st == 0
    idx = jnp.arange(CAP + n3, dtype=jnp.int32)
    tpos = jnp.cumsum(is_table.astype(jnp.int32)) - 1       # table rank
    last_table = jax.lax.cummax(jnp.where(is_table, idx, -1))
    prev_h = jnp.concatenate([jnp.full((1,), -INT32_MAX, jnp.int32),
                              sh[:-1]])
    prev_l = jnp.concatenate([jnp.full((1,), -INT32_MAX, jnp.int32),
                              sl[:-1]])
    is_new = (sh != prev_h) | (sl != prev_l)
    run_start = jax.lax.cummax(jnp.where(is_new, idx, -1))
    matched = (last_table >= run_start) & (sh != INT32_MAX)
    res_sorted = jnp.where(matched, tpos, -1)
    # table rows write to the drop slot (n3); query rows to their slot
    out = jnp.full((n3,), -1, jnp.int32).at[
        jnp.where(is_table, n3, ss)].set(res_sorted, mode="drop")
    return out.reshape(3, NSTREAM, -1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    table, q = make_workload()
    ref = jax.device_get(tree(16)(table, q))
    for name, fn in [("tree16", tree(16)), ("tree32", tree(32)),
                     ("tree64", tree(64)), ("flat64", flat(64)),
                     ("flat128", flat(128)), ("flat256", flat(256)),
                     ("sortrank", sortrank)]:
        try:
            out = jax.device_get(fn(table, q))
            if name == "sortrank":
                # sortrank orders z as (-1, 0, +1) matching z3's stack
                ok = np.array_equal(out, ref)
            else:
                ok = np.array_equal(out, ref)
            ms = time_fn(fn, table, q, reps=reps)
            print(f"{name:10s} {ms:8.3f} ms  match={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
