"""Coordinate keys, deduplication and lookup over fixed-capacity buffers.

TPU-native replacement for the reference's CUDA hashing stack
(reference: torchsparse backend/hash/hash_cuda.cu:10-56 FNV-1a hash,
backend/hashmap/hashmap_cuda.cu:8-212 cuckoo hash table,
backend/others/query_cuda.cu:9-56 query kernel).

Instead of a 64-bit hash + GPU cuckoo table, we pack integer voxel
coordinates (b, x, y, z) *losslessly* into two int32 sort keys and use:

- ``unique_coords``: lexicographic ``lax.sort`` + boundary cumsum for
  deduplication (replaces ``torch.unique`` over FNV hashes, which can in
  principle collide; ours cannot), and
- ``lookup_coords``: a vectorized two-key binary search into the sorted key
  table (replaces the cuckoo-table ``sphashquery``).

Everything is static-shape: buffers carry a fixed capacity, padding lanes
hold ``INVALID`` keys that sort to the end and never match a query.

Coordinate budget (packed into two int31 keys):
  key_hi = (b << 15) | x        b in [0, 2^16), x in [0, 2^15)
  key_lo = (y << 15) | z        y in [0, 2^15), z in [0, 2^15)
x/y/z must be non-negative (datasets min-shift coords, reference:
pcseg/data/dataset/semantickitti/semantickitti_voxel.py:113) and < 32768 —
at 0.05 m that is a 1.6 km span, far beyond any LiDAR scan.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max
COORD_BITS = 15
COORD_MAX = 1 << COORD_BITS  # 32768


class Keys(NamedTuple):
    """Two-int32 lossless coordinate key. Invalid lanes are (INT32_MAX, INT32_MAX)."""

    hi: jax.Array  # [..., N] int32
    lo: jax.Array  # [..., N] int32


def make_keys(coords: jax.Array, valid: jax.Array) -> Keys:
    """Pack coords [N, 4] (b, x, y, z int32) + valid [N] bool into sort keys.

    Out-of-range coords are treated as invalid (mirrors the reference's
    implicit assumption that quantized coords fit the hash domain).
    """
    b, x, y, z = coords[..., 0], coords[..., 1], coords[..., 2], coords[..., 3]
    in_range = (
        (x >= 0) & (x < COORD_MAX)
        & (y >= 0) & (y < COORD_MAX)
        & (z >= 0) & (z < COORD_MAX)
        & (b >= 0)
    )
    ok = valid & in_range
    hi = jnp.where(ok, (b << COORD_BITS) | x, INT32_MAX)
    lo = jnp.where(ok, (y << COORD_BITS) | z, INT32_MAX)
    return Keys(hi.astype(jnp.int32), lo.astype(jnp.int32))


def sort_keys_blocked(hi: jax.Array, lo: jax.Array, payload: jax.Array,
                      blk: int):
    """Lexicographic sort of (hi, lo) keys + payload for NEARLY-sorted input.

    Downsampled voxel keys arrive 95-97% pair-sorted with bounded
    displacement (measured on ray-cast scans: max 7.8k/5.2k/2.0k/0.6k at
    L1-L4, ROADMAP round-4 plan #2), because the parent key of a key-sorted
    child table is monotone in (b, x) and only locally shuffled by the
    y/z bit drops. Two overlapping block-sort passes fully sort any
    sequence whose rows are within ``blk // 2`` of their final position:
    pass 1 sorts disjoint blocks of ``blk``, pass 2 re-sorts the same
    blocks shifted by ``blk // 2``. An is-sorted check then picks the
    blocked result or falls back to a full ``lax.sort`` via ``lax.cond``,
    so the output is sorted UNCONDITIONALLY — the displacement bound is a
    fast path, never a correctness assumption.

    Why it can beat one global sort: both XLA sorts are bitonic-stage
    loops, but the blocked passes run log2(blk)-squared comparator stages
    on VMEM-resident [nb, blk] rows instead of log2(n)-squared stages with
    whole-array HBM round trips.
    """
    n = hi.shape[0]
    half = blk // 2
    if n <= 2 * blk:  # too small for two passes to pay for themselves
        return jax.lax.sort((hi, lo, payload), num_keys=2)

    pad = (-n) % blk
    hp = _pad_to(hi, n + pad, INT32_MAX)
    lp = _pad_to(lo, n + pad, INT32_MAX)
    pp = _pad_to(payload, n + pad, 0)
    nb = (n + pad) // blk

    def rows(x, m):
        return x.reshape(m, blk)

    hp, lp, pp = jax.lax.sort(
        (rows(hp, nb), rows(lp, nb), rows(pp, nb)), num_keys=2)
    hp, lp, pp = (x.reshape(-1) for x in (hp, lp, pp))

    def mid(x):
        return rows(x[half:-half], nb - 1)

    mh, ml, mp = jax.lax.sort((mid(hp), mid(lp), mid(pp)), num_keys=2)
    out = []
    for full, m in ((hp, mh), (lp, ml), (pp, mp)):
        out.append(jnp.concatenate(
            [full[:half], m.reshape(-1), full[-half:]])[:n])
    oh, ol, op = out

    asc = (oh[1:] > oh[:-1]) | ((oh[1:] == oh[:-1]) & (ol[1:] >= ol[:-1]))
    return jax.lax.cond(
        jnp.all(asc),
        lambda: (oh, ol, op),
        lambda: jax.lax.sort((hi, lo, payload), num_keys=2),
    )


class UniqueResult(NamedTuple):
    coords: jax.Array       # [cap, 4] int32 unique coords, sorted by key; padding = -1
    valid: jax.Array        # [cap] bool
    inverse: jax.Array      # [N] int32 index of each input row in `coords`; -1 for
                            #     invalid inputs or rows beyond capacity
    num_unique: jax.Array   # [] int32 number of unique valid coords (may exceed cap)
    keys: Keys              # [cap] sorted keys of the unique coords (INVALID pad)


def unique_coords(coords: jax.Array, valid: jax.Array, cap: int,
                  sort_block: int | None = None) -> UniqueResult:
    """Deduplicate coords into a fixed-capacity sorted table.

    TPU equivalent of ``sphash`` + ``torch.unique`` + ``sphashquery``
    (reference: pcseg/model/segmentor/voxel/minkunet/utils.py:16-19) done in
    one pass: sort by (hi, lo), mark segment starts, prefix-sum for ids.

    The output table is sorted by key, which is exactly what
    :func:`lookup_coords` needs — no separate table build.

    ``sort_block``: when the input keys are known nearly-sorted (downsample
    of a sorted table), route through :func:`sort_keys_blocked` with this
    block size (always-correct fast path).
    """
    n = coords.shape[0]
    keys = make_keys(coords, valid)
    iota = jnp.arange(n, dtype=jnp.int32)
    if sort_block:
        sh, sl, perm = sort_keys_blocked(keys.hi, keys.lo, iota, sort_block)
    else:
        sh, sl, perm = jax.lax.sort((keys.hi, keys.lo, iota), num_keys=2)

    valid_sorted = sh != INT32_MAX
    prev_hi = jnp.concatenate([jnp.full((1,), -INT32_MAX, jnp.int32), sh[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -INT32_MAX, jnp.int32), sl[:-1]])
    is_new = ((sh != prev_hi) | (sl != prev_lo)) & valid_sorted

    uid = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # segment id per sorted row
    num_unique = jnp.sum(is_new.astype(jnp.int32))

    in_cap = (uid >= 0) & (uid < cap) & valid_sorted
    # representative row (first occurrence) per unique id -> unique coords/keys
    scatter_id = jnp.where(is_new & in_cap, uid, cap)  # cap = drop slot
    out_coords = jnp.full((cap + 1, 4), -1, jnp.int32)
    out_coords = out_coords.at[scatter_id].set(coords[perm], mode="drop")
    out_hi = jnp.full((cap + 1,), INT32_MAX, jnp.int32).at[scatter_id].set(sh, mode="drop")
    out_lo = jnp.full((cap + 1,), INT32_MAX, jnp.int32).at[scatter_id].set(sl, mode="drop")

    inv_sorted = jnp.where(in_cap, uid, -1)
    inverse = jnp.zeros((n,), jnp.int32).at[perm].set(inv_sorted)

    out_valid = out_hi[:cap] != INT32_MAX
    return UniqueResult(
        coords=out_coords[:cap],
        valid=out_valid,
        inverse=inverse,
        num_unique=num_unique,
        keys=Keys(out_hi[:cap], out_lo[:cap]),
    )


def lookup_keys_bsearch(table: Keys, q: Keys) -> jax.Array:
    """Find each query key in a *sorted* key table; -1 on miss.

    Vectorized two-key binary search — the TPU replacement for the cuckoo
    hash probe (reference: torchsparse backend/others/query_cuda.cu:9-56).
    O(log cap) rounds of gathers, fully static control flow.

    NOTE: kept as the reference implementation; production lookups use
    :func:`lookup_keys` (wide-node tree search), which replaces the ~18
    rounds of scalar gathers (slow on TPU) with 3 rounds of 128-byte row
    gathers — measured ~20x faster at 5M queries on v5e.
    """
    cap = table.hi.shape[0]
    nbits = max(1, (cap - 1).bit_length())
    qshape = q.hi.shape

    log = jnp.zeros(qshape, jnp.int32)  # lower bound (inclusive) of search window
    # classic power-of-two descent: after the loop, lo = index of last entry <= q
    step = 1 << (nbits - 1)
    for _ in range(nbits):
        cand = log + step
        ok = cand < cap
        cand_c = jnp.minimum(cand, cap - 1)
        th = table.hi[cand_c]
        tl = table.lo[cand_c]
        le = (th < q.hi) | ((th == q.hi) & (tl <= q.lo))
        log = jnp.where(ok & le, cand, log)
        step >>= 1

    th = table.hi[log]
    tl = table.lo[log]
    hit = (th == q.hi) & (tl == q.lo) & (q.hi != INT32_MAX)
    return jnp.where(hit, log, -1).astype(jnp.int32)


_NODE = 16  # tree branching: 16 keys/node -> 128-byte interleaved rows


def _pad_to(x: jax.Array, n: int, fill) -> jax.Array:
    if x.shape[0] == n:
        return x
    return jnp.concatenate(
        [x, jnp.full((n - x.shape[0],) + x.shape[1:], fill, x.dtype)])


def _count_le(h: jax.Array, l: jax.Array, qh: jax.Array, ql: jax.Array) -> jax.Array:
    """#(table keys <= query) within a node row; h/l [..., NODE], q [...]."""
    le = (h < qh[..., None]) | ((h == qh[..., None]) & (l <= ql[..., None]))
    return jnp.sum(le.astype(jnp.int32), axis=-1)


def _tree_search(table: Keys, qh: jax.Array, ql: jax.Array, node: int):
    """Position of the last table key <= q (clamped to [0, cap-1]).

    Shared core of lookup_keys / lookup_keys_z3. Returns pos only; callers
    read the keys around pos from the interleaved window table (ONE 32-byte
    row gather) instead of per-element scalar gathers / take_along_axis —
    profiling round 1 showed those scalar epilogues cost more than the tree
    descent itself (~50 ms/step at mk34 scale).
    """
    _n = node
    cap = table.hi.shape[0]

    if cap <= _n * _n:
        cnt = _count_le(table.hi[None, :], table.lo[None, :], qh, ql)
        return jnp.maximum(cnt - 1, 0)

    def make_level(hi, lo):
        n = hi.shape[0]
        nn = -(-n // _n)
        hi_p = _pad_to(hi, nn * _n, INT32_MAX).reshape(nn, _n)
        lo_p = _pad_to(lo, nn * _n, INT32_MAX).reshape(nn, _n)
        return jnp.concatenate([hi_p, lo_p], axis=1), hi_p[:, 0], lo_p[:, 0]

    levels = []
    hi, lo = table.hi, table.lo
    while hi.shape[0] > _n * _n:
        rows, hi, lo = make_level(hi, lo)
        levels.append(rows)
    top_hi, top_lo = hi, lo

    cnt = _count_le(top_hi[None, :], top_lo[None, :], qh, ql)
    nd = jnp.maximum(cnt - 1, 0)
    for rows in reversed(levels):
        r = rows[nd]
        c = _count_le(r[:, :_n], r[:, _n:], qh, ql)
        nd = nd * _n + jnp.maximum(c - 1, 0)
    return jnp.minimum(nd, cap - 1)


def _key_window(table: Keys) -> jax.Array:
    """[cap, 8] int32: row i = [hi[i-1], lo[i-1], hi[i], lo[i], hi[i+1],
    lo[i+1], pad, pad]. One row gather yields the search position's key and
    both neighbors (padded lanes keep rows 128-bit aligned). Built with
    shifts only; identical rebuilds within one jit are CSE'd away."""
    cap = table.hi.shape[0]
    inval = jnp.full((1,), INT32_MAX, jnp.int32)
    hm = jnp.concatenate([inval, table.hi[:-1]])
    lm = jnp.concatenate([inval, table.lo[:-1]])
    hp = jnp.concatenate([table.hi[1:], inval])
    lp = jnp.concatenate([table.lo[1:], inval])
    pad = jnp.full((cap,), INT32_MAX, jnp.int32)
    return jnp.stack(
        [hm, lm, table.hi, table.lo, hp, lp, pad, pad], axis=1)


def lookup_keys_z3(table: Keys, q: Keys, node: int = _NODE):
    """One tree search -> indices of keys (q-1, q, q+1): [3, Nq] int32.

    Exploits the packed key layout: the z-1 / z+1 neighbors of a voxel have
    keys exactly lo-1 / lo+1, which (table being sorted and keys distinct)
    can only sit at positions pos-1 / pos / pos+1 around the search result —
    one window-row gather replaces two full tree searches. Field wrap at
    z=0 / z=2^15-1 produces keys that cannot exist in a real table
    (z ~ 32767 exceeds any scan extent), so wraps are natural misses.
    """
    cap = table.hi.shape[0]
    qshape = q.hi.shape
    qh = q.hi.reshape(-1)
    ql = q.lo.reshape(-1)
    qvalid = qh != INT32_MAX

    pos = _tree_search(table, qh, ql, node)
    w = _key_window(table)[pos]
    mh, ml, th, tl, ph, pl = (w[:, i] for i in range(6))
    pm = jnp.maximum(pos - 1, 0)
    pp = jnp.minimum(pos + 1, cap - 1)

    def find(dlo):
        tq_h, tq_l = qh, ql + dlo
        at_pos = (th == tq_h) & (tl == tq_l)
        at_m = (mh == tq_h) & (ml == tq_l)
        at_p = (ph == tq_h) & (pl == tq_l)
        idx = jnp.where(at_pos, pos,
                        jnp.where(at_m, pm, jnp.where(at_p, pp, -1)))
        return jnp.where(qvalid, idx, -1).astype(jnp.int32)

    return jnp.stack([find(-1), find(0), find(1)]).reshape((3,) + qshape)


def lookup_keys(table: Keys, q: Keys, node: int = _NODE) -> jax.Array:
    """Find each query key in a *sorted* key table; -1 on miss.

    Wide-node (16-ary) tree search: TPU scalar gathers are ~25x slower per
    element than 128-byte row gathers (measured), so instead of a binary
    search (log2(cap) scalar-gather rounds) we walk a 3-level tree whose
    nodes are [16 hi | 16 lo] int32 rows:

      top:  <=16^2 separator keys, brute-force vector compare (no gather)
      L2:   one 128B row gather -> 16-way branch
      L1:   one 128B row gather -> 16-way branch
      L0:   one 128B row gather -> position; hit check via the interleaved
            window table (one 32B row gather)

    The tree is built from the sorted table with strided slices only (no
    sort); padding keys are INT32_MAX and sort last. Replaces the
    reference's GPU cuckoo-hash probe (torchsparse query_cuda.cu:9-56).
    """
    qshape = q.hi.shape
    qh = q.hi.reshape(-1)
    ql = q.lo.reshape(-1)
    pos = _tree_search(table, qh, ql, node)
    w = _key_window(table)[pos]
    hit = (w[:, 2] == qh) & (w[:, 3] == ql) & (qh != INT32_MAX)
    return jnp.where(hit, pos, -1).reshape(qshape).astype(jnp.int32)


def lookup_coords(table: Keys, coords: jax.Array, valid: jax.Array) -> jax.Array:
    """Look up coords [..., 4] in a sorted unique-key table; -1 on miss."""
    return lookup_keys(table, make_keys(coords, valid))
