"""Probe devoxelize-backward variants on the TPU.

The devox transpose scatters dout*w [8, N, C] into dvox [V, C]; per corner
the target ids are MONOTONE (points sorted by key). Variants:
  a) autodiff scatter-add (current default; 8 unsorted scatters)
  b) scatter-add with indices_are_sorted=True
  c) segment_sum(..., indices_are_sorted=True) per corner
  d) prefix-sum run-bounds transpose (devox_transpose_bounds path)

Timing: REPS in-jit lax.scan iterations, one device_get at the end
(tunnel rule — see memory/openpcseg-tpu-env).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 50


def timed(name, fn, *args):
    from functools import partial
    f = jax.jit(partial(fn, v=args[-1]))
    args = args[:-1]
    r = f(*args)
    jax.device_get(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.device_get(r)
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


def make_case(n, v, c, seed):
    rng = np.random.default_rng(seed)
    # monotone per-corner ids with misses (-1)
    idx = np.sort(rng.integers(0, v, size=(8, n)), axis=1).astype(np.int32)
    miss = rng.random((8, n)) < 0.1
    idx[miss] = -1
    w = rng.random((8, n)).astype(np.float32) * ~miss
    dout = rng.standard_normal((n, c)).astype(jnp.bfloat16)
    return jnp.asarray(idx), jnp.asarray(w), jnp.asarray(dout)


def variant_a(idx, w, dout, v):
    def one(_, __):
        safe = jnp.maximum(idx, 0)
        acc = jnp.zeros((v, dout.shape[1]), jnp.float32)
        for k in range(8):
            zs = dout.astype(jnp.float32) * w[k][:, None]
            zs = jnp.where((idx[k] >= 0)[:, None], zs, 0.0)
            acc = acc.at[safe[k]].add(zs)
        return None, jnp.tanh(acc).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def variant_b(idx, w, dout, v):
    def one(_, __):
        safe = jnp.minimum(jnp.where(idx < 0, v, idx), v)
        acc = jnp.zeros((v + 1, dout.shape[1]), jnp.float32)
        for k in range(8):
            zs = dout.astype(jnp.float32) * w[k][:, None]
            acc = acc.at[safe[k]].add(
                zs, indices_are_sorted=True, unique_indices=False)
        return None, jnp.tanh(acc[:v]).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def variant_c(idx, w, dout, v):
    def one(_, __):
        routed = jnp.where(idx < 0, v, idx)
        acc = jnp.zeros((v, dout.shape[1]), jnp.float32)
        for k in range(8):
            zs = dout.astype(jnp.float32) * w[k][:, None]
            s = jax.ops.segment_sum(zs, routed[k], num_segments=v + 1,
                                    indices_are_sorted=True)
            acc = acc + s[:v]
        return None, jnp.tanh(acc).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def variant_d(idx, w, dout, v):
    from openpcseg_tpu.ops.voxelize import devox_transpose_bounds
    lo, hi = devox_transpose_bounds(idx, v)

    def one(_, __):
        k8, n = idx.shape
        c = dout.shape[1]
        d32 = dout.astype(jnp.float32)
        zs = (d32[None] * w[:, :, None]).reshape(k8 * n, c)
        csz = jnp.concatenate(
            [jnp.zeros((1, c), jnp.float32), jnp.cumsum(zs, axis=0)], axis=0)
        offs = (jnp.arange(k8, dtype=jnp.int32) * n)[:, None]
        top = csz[(jnp.minimum(hi, n - 1) + offs + 1).reshape(-1)]
        bot = csz[(jnp.maximum(lo, 0) + offs).reshape(-1)]
        dvox = (top - bot).reshape(k8, v, c)
        dvox = jnp.where((hi >= 0)[..., None], dvox, 0.0).sum(axis=0)
        return None, jnp.tanh(dvox).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def variant_e(idx, w, dout, v):
    def one(_, __):
        safe = jnp.maximum(idx, 0)
        acc = jnp.zeros((v, dout.shape[1]), jnp.bfloat16)
        for k in range(8):
            zs = dout * w[k][:, None].astype(jnp.bfloat16)
            zs = jnp.where((idx[k] >= 0)[:, None], zs, 0.0)
            acc = acc.at[safe[k]].add(zs)
        return None, jnp.tanh(acc).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def main():
    for (n, v, c) in [(98304, 37376, 128), (98304, 10880, 256)]:
        print(f"== N={n} V={v} C={c}")
        idx, w, dout = make_case(n, v, c, 0)
        timed("a: scatter-add", variant_a, idx, w, dout, v)
        timed("b: scatter-add sorted", variant_b, idx, w, dout, v)
        timed("c: segment_sum sorted", variant_c, idx, w, dout, v)
        timed("d: prefix-sum bounds", variant_d, idx, w, dout, v)
        timed("e: scatter-add bf16 acc", variant_e, idx, w, dout, v)




def make_case_unsorted(n, v, c, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, v, size=(8, n)).astype(np.int32)
    miss = rng.random((8, n)) < 0.1
    idx[miss] = -1
    w = rng.random((8, n)).astype(np.float32) * ~miss
    dout = rng.standard_normal((n, c)).astype(jnp.bfloat16)
    return jnp.asarray(idx), jnp.asarray(w), jnp.asarray(dout)


def variant_f(idx, w, dout, v):
    # one concatenated scatter over all 8 corners
    def one(_, __):
        k8, n = idx.shape
        zs = (dout.astype(jnp.float32)[None] * w[:, :, None]).reshape(k8 * n, -1)
        safe = jnp.maximum(idx, 0).reshape(-1)
        zs = jnp.where((idx >= 0).reshape(-1)[:, None], zs, 0.0)
        acc = jnp.zeros((v, dout.shape[1]), jnp.float32).at[safe].add(zs)
        return None, jnp.tanh(acc).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def variant_g(idx, w, dout, v):
    # hoisted permutation (computed once outside the timed loop, as the
    # geometry pass would): per-corner sort of ids; bwd = row-gather by the
    # permutation + sorted scatter
    k8, n = idx.shape
    routed = jnp.where(idx < 0, v, idx)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (k8, n))
    sid, perm = jax.lax.sort((routed, iota), num_keys=1, dimension=1)

    def one(_, __):
        acc = jnp.zeros((v + 1, dout.shape[1]), jnp.float32)
        for k in range(8):
            zs = dout.astype(jnp.float32)[perm[k]] * w[k][perm[k]][:, None]
            acc = acc.at[sid[k]].add(zs, indices_are_sorted=True)
        return None, jnp.tanh(acc[:v]).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def main2():
    for (n, v, c) in [(98304, 37376, 128), (98304, 10880, 256)]:
        print(f"== UNSORTED ids N={n} V={v} C={c}")
        idx, w, dout = make_case_unsorted(n, v, c, 0)
        timed("a: 8x scatter-add", variant_a, idx, w, dout, v)
        timed("f: 1x concat scatter", variant_f, idx, w, dout, v)
        timed("g: hoisted perm+sorted", variant_g, idx, w, dout, v)





def make_case_runs(n, v, c, run, seed):
    """ids piecewise-constant in runs of ~`run` (points grouped by coarse
    cell), run targets random — the real shared-corner devox structure."""
    rng = np.random.default_rng(seed)
    ncell = -(-n // run)
    cell_of = np.repeat(np.arange(ncell), run)[:n]
    idx = np.empty((8, n), np.int32)
    for k in range(8):
        tgt = rng.integers(0, v, size=ncell).astype(np.int32)
        idx[k] = tgt[cell_of]
    miss = rng.random((8, n)) < 0.05
    idx[miss] = -1
    w = rng.random((8, n)).astype(np.float32) * ~miss
    dout = rng.standard_normal((n, c)).astype(jnp.bfloat16)
    return jnp.asarray(idx), jnp.asarray(w), jnp.asarray(dout)


def variant_h(idx, w, dout, v):
    # run pre-reduce: contiguous equal-id runs summed via monotone run-id
    # segment_sum, then one scatter of run sums
    k8, n = idx.shape
    new = jnp.concatenate(
        [jnp.ones((k8, 1), jnp.bool_), idx[:, 1:] != idx[:, :-1]], axis=1)
    rid = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1  # [8, N] monotone
    nruns = n  # static bound
    first = jnp.where(new, jnp.arange(n, dtype=jnp.int32)[None], n)
    run_first = jax.vmap(lambda r, f: jax.ops.segment_min(
        f, r, num_segments=nruns, indices_are_sorted=True))(rid, first)
    run_tgt = jax.vmap(lambda i, rf: jnp.where(
        rf < n, i[jnp.minimum(rf, n - 1)], -1))(idx, run_first)

    def one(_, __):
        acc = jnp.zeros((v, dout.shape[1]), jnp.float32)
        for k in range(8):
            zs = dout.astype(jnp.float32) * w[k][:, None]
            rs = jax.ops.segment_sum(zs, rid[k], num_segments=nruns,
                                     indices_are_sorted=True)
            safe = jnp.maximum(run_tgt[k], 0)
            rs = jnp.where((run_tgt[k] >= 0)[:, None], rs, 0.0)
            acc = acc.at[safe].add(rs)
        return None, jnp.tanh(acc).sum()
    _, out = jax.lax.scan(one, None, jnp.arange(REPS))
    return out


def main3():
    for (n, v, c, run) in [(98304, 37376, 128, 9), (98304, 10880, 256, 36)]:
        print(f"== RUN ids N={n} V={v} C={c} run={run}")
        idx, w, dout = make_case_runs(n, v, c, run, 0)
        timed("a: 8x scatter-add", variant_a, idx, w, dout, v)


if __name__ == "__main__":
    main3()
