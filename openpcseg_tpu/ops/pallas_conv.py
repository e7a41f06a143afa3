"""Pallas TPU kernel for the z-window submanifold sparse conv.

Replaces the XLA im2col window conv (sparse_conv.py `_window_apply`) whose
row gathers realize only a few GB/s of HBM bandwidth (BASELINE.md,
tools/perf traces: the conv path is 224 of 360 ms/step). The kernel keeps
the whole feature table resident in VMEM and performs the window gathers as
*soft one-hot matmuls on the MXU* — no HBM gathers at all.

Structure (reference hot loop this replaces: torchsparse
backend/convolution/convolution_cuda.cu:14-80 gather-GEMM-scatter):

- rows are sorted by packed (b,x,y,z) keys, so for each kernel column
  (dx,dy) the per-output "base" neighbor row index is MONOTONE in the
  output row (adding a constant (dx,dy) preserves lexicographic key order);
- for a block of `blk` consecutive outputs, the bases therefore form 1-2
  contiguous clusters (2 when the block straddles an x/y slab boundary):
  two disjoint VMEM windows of `win` rows cover them exactly;
- gathering window rows to outputs is a [win, blk] one-hot (iota == local
  index) contracted with the [win, C] window on the MXU; the five window
  masks (sparse_conv.py window-column derivation) fold INTO the one-hot
  (they broadcast along the lane dim for free), so each column costs three
  soft-one-hot dots (z-1, z, z+1 slots) plus three small weight dots into a
  float32 VMEM accumulator. Zero scatters, zero HBM row gathers, one HBM
  read of feats, one write of out.

Exactness: window assignment is by value (a base matches the unique window
containing it — windows are made disjoint); blocks whose cluster spread
exceeds the two windows set an overflow flag and the call falls back to the
XLA window conv via lax.cond (rare: p999 cluster spreads fit, measured on
ray-cast scans, tools/perf/spread probes).

Backward: dfeats is the same kernel over dout with offset-flipped
transposed weights (the window plan is identical — symmetric kernels);
dW accumulates [K, Cin, Cout] in a VMEM scratch across grid steps in a
second kernel pass.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse_conv import _COLUMN_PLANS, _plan_key, _window_conv_impl

INTERPRET = False  # tests set True on CPU (pallas interpret mode)

import os as _os

BLK = int(_os.environ.get("OPENPCSEG_PALLAS_BLK", 512))   # rows per step
WIN = int(_os.environ.get("OPENPCSEG_PALLAS_WIN", 512))   # window rows
NW = int(_os.environ.get("OPENPCSEG_PALLAS_NW", 16))      # max windows
# The dot FLOPs scale with WIN while coverage needs only the per-block
# cluster spread (med ~500, p99 ~2700, worst ~7000 on ray-cast scans):
# WIN=512 with generous NW wins over fewer, wider windows because the
# fori_loop window count is dynamic (mean ~1.1) and misses are free.


# ------------------------------------------------------------------ plan --


def build_window_plan(kmap: jax.Array, offsets_key) -> dict:
    """XLA-side precompute shared by fwd/bwd kernels.

    Returns dict with:
      base  [ncols, Np]   int32 absolute neighbor row (clamped >= 0)
      bits  [ncols, Np]   int32 mask bitfield (a0|a1<<1|b1<<2|c1<<3|c2<<4)
      starts[ncols, nb, 2] int32 8-aligned disjoint window starts
      overflow            bool scalar — some base escaped both windows
    Np is N padded up to a BLK multiple. Depends only on the kernel map →
    one plan serves every conv at the level (and fwd + bwd share it).
    """
    win_cols, plain = _COLUMN_PLANS[offsets_key]
    assert not plain, "pallas window conv requires full z-extent columns"
    n = kmap.shape[1]
    np_pad = -(-n // BLK) * BLK
    nb = np_pad // BLK

    bases, bits_l = [], []
    for _is_center, rows in win_cols:
        km, k0, kp = rows
        rm, r0, rp = kmap[km], kmap[k0], kmap[kp]
        hm, h0, hp = rm >= 0, r0 >= 0, rp >= 0
        base = jnp.where(h0, r0, jnp.where(hp, rp, rm))
        a0 = hm & (h0 | hp)
        a1 = hm & ~h0 & ~hp
        b1 = h0
        c1 = hp & ~h0
        c2 = hp & h0
        bits = (a0.astype(jnp.int32) | (a1.astype(jnp.int32) << 1)
                | (b1.astype(jnp.int32) << 2) | (c1.astype(jnp.int32) << 3)
                | (c2.astype(jnp.int32) << 4))
        hit = hm | h0 | hp
        # rows with no hit: park the base at 0 with zero masks
        bases.append(jnp.where(hit, jnp.maximum(base, 0), 0))
        bits_l.append(jnp.where(hit, bits, 0))

    base = jnp.stack(bases)          # [ncols, n]
    bits = jnp.stack(bits_l)
    if np_pad != n:
        pad = ((0, 0), (0, np_pad - n))
        base = jnp.pad(base, pad)
        bits = jnp.pad(bits, pad)

    bb = base.reshape(len(win_cols), nb, BLK)
    hb = (bits.reshape(len(win_cols), nb, BLK) != 0)
    big = jnp.int32(2 ** 30)
    bbv = jnp.where(hb, bb, big)                          # miss -> +inf

    # greedy interval cover with up to NW disjoint aligned windows: window
    # w starts (8-aligned, minus 2 slack so base-1 z-slots stay inside) at
    # the first base not covered by windows 0..w-1. Windows never overlap
    # (each starts past the previous end), so a base matches at most one
    # window in the kernel's equality gather -> no double counting.
    starts_l = []
    end = jnp.full(bbv.shape[:2], -1, jnp.int32)          # [ncols, nb]
    cnt = jnp.zeros(bbv.shape[:2], jnp.int32)
    for _w in range(NW):
        nxt = jnp.min(jnp.where(bbv > end[..., None], bbv, big), axis=2)
        has = nxt < big
        s = jnp.maximum(((nxt - 2) // 8) * 8, 0)
        s = jnp.maximum(s, end + 1)                        # disjoint
        s = jnp.where(has, s, end + 1 + WIN)               # park empties
        starts_l.append(s)
        end = s + WIN - 1
        cnt = cnt + has.astype(jnp.int32)
    starts = jnp.stack(starts_l, axis=-1).astype(jnp.int32)  # [ncols,nb,NW]

    # exactness: each needed row — base-1 when the a0 slot is live, base
    # when a1/b1/c1, base+1 when c2 — must fall inside SOME window (slots
    # match by equality in whichever disjoint window holds their row, so
    # coverage by the union is sufficient; a slot row in a neighbouring
    # window is matched by that window's pass).
    bits3 = bits.reshape(len(win_cols), nb, BLK)
    m_a0 = (bits3 & 1) != 0
    m_mid = (bits3 & 0b01110) != 0
    m_c2 = ((bits3 >> 4) & 1) != 0

    def in_any(r):
        cov = jnp.zeros(r.shape, bool)
        for w in range(NW):
            s = starts[..., w][..., None]
            cov = cov | ((r >= s) & (r < s + WIN))
        return cov

    overflow = jnp.any(
        hb & ((m_a0 & ~in_any(bb - 1))
              | (m_mid & ~in_any(bb))
              | (m_c2 & ~in_any(bb + 1))))
    return dict(base=base, bits=bits, starts=starts, wcnt=cnt,
                overflow=overflow, n_pad=np_pad, ncols=len(win_cols))


# ---------------------------------------------------------------- kernels --


def _slot_locs(loc_abs, bits, start):
    """Per-slot masked local indices: the five window masks FOLD INTO the
    gather index (masked-off -> -1, which no iota row equals), so each slot
    needs exactly one equality compare and zero mask multiplies — the
    elementwise one-hot construction is the kernel's VPU bottleneck.

    slot_m gathers row base-1 when a0 else base when a1; slot_0 gathers
    base when b1; slot_p gathers base when c1 else base+1 when c2
    (sparse_conv.py window-column mask derivation)."""
    loc = loc_abs - start
    a0 = (bits & 1) != 0
    a1 = ((bits >> 1) & 1) != 0
    b1 = ((bits >> 2) & 1) != 0
    c1 = ((bits >> 3) & 1) != 0
    c2 = ((bits >> 4) & 1) != 0
    neg = jnp.int32(-1)
    locm = jnp.where(a0, loc - 1, jnp.where(a1, loc, neg))
    loc0 = jnp.where(b1, loc, neg)
    locp = jnp.where(c1, loc, jnp.where(c2, loc + 1, neg))
    return locm, loc0, locp


def _slot_gathers(loc_abs, bits, start, window):
    """The three slot gathers of one (column, window) pair.

    Returns (gm, g0, gp) [BLK, C]: masked one-hot MXU gathers via a single
    [3*BLK, WIN] @ [WIN, C] dot in the MXU-NATIVE orientation — outputs on
    sublanes, window index on lanes, so the lhs contracts over its lane dim
    and Mosaic inserts no multi-MB operand transpose (the transposed
    orientation measured 3x slower than XLA). Dtype follows the window
    (bf16 on the production path; f32 for exactness tests)."""
    f32 = jnp.float32
    cdt = window.dtype
    locm, loc0, locp = _slot_locs(loc_abs, bits, start)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)

    def g_of(loc):
        oh = (iota == loc[:, None]).astype(cdt)        # [BLK, WIN]
        return jnp.dot(oh, window, preferred_element_type=f32).astype(cdt)

    return g_of(locm), g_of(loc0), g_of(locp)


def _fwd_kernel(ncols, cout, starts_ref, wcnt_ref, base_ref, bits_ref,
                feats_ref, w_ref, o_ref, acc_ref, oh_ref):
    """Grid (nb,): one BLK-row output block per step.

    starts [ncols, nb, NW] + wcnt [ncols, nb] in SMEM; base/bits
    [ncols, Np] VMEM int32; feats [Np, C] VMEM; w [ncols*3, C, cout] VMEM;
    out block [BLK, cout]. Window loops past wcnt are predicated off."""
    b = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    f32 = jnp.float32

    for j in range(ncols):
        loc_abs = base_ref[j, :]                         # [BLK] lanes
        bits = bits_ref[j, :]

        def body(wnd, _, j=j, loc_abs=loc_abs, bits=bits):
            # dynamic trip count (mean ~1.1 windows) keeps the kernel MLIR
            # small — an NW-unrolled predicated loop compiles ~8x slower.
            # The three slot one-hots are assembled into ONE [3*BLK, WIN]
            # scratch so the gather is a single M-batched MXU dot (small
            # per-slot dots ran at ~15 TF/s; M-batching tiles across MXUs).
            start = pl.multiple_of(starts_ref[j, b, wnd], 8)
            window = feats_ref[pl.ds(start, WIN), :]      # [WIN, C]
            cdt = window.dtype
            locm, loc0, locp = _slot_locs(loc_abs, bits, start)
            iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
            oh_ref[0:BLK, :] = (iota == locm[:, None]).astype(cdt)
            oh_ref[BLK:2 * BLK, :] = (iota == loc0[:, None]).astype(cdt)
            oh_ref[2 * BLK:3 * BLK, :] = (iota == locp[:, None]).astype(cdt)
            g = jnp.dot(oh_ref[:], window,
                        preferred_element_type=f32)       # [3*BLK, C]
            gc = g.astype(cdt)
            acc_ref[:] += jnp.dot(gc[0:BLK], w_ref[3 * j],
                                  preferred_element_type=f32)
            acc_ref[:] += jnp.dot(gc[BLK:2 * BLK], w_ref[3 * j + 1],
                                  preferred_element_type=f32)
            acc_ref[:] += jnp.dot(gc[2 * BLK:3 * BLK], w_ref[3 * j + 2],
                                  preferred_element_type=f32)
            return 0

        jax.lax.fori_loop(0, wcnt_ref[j, b], body, 0)

    o_ref[:] = acc_ref[:]


def _run_fwd(feats_p, w_cols, plan):
    """feats_p [Np, C] bf16 (padded), w_cols [ncols*3, C, cout] bf16."""
    np_pad = plan["n_pad"]
    ncols = plan["ncols"]
    nb = np_pad // BLK
    cout = w_cols.shape[-1]
    kern = partial(_fwd_kernel, ncols, cout)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                       # starts, wcnt -> SMEM
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ncols, BLK), lambda b, s, w: (0, b)),  # base blk
            pl.BlockSpec((ncols, BLK), lambda b, s, w: (0, b)),  # bits blk
            pl.BlockSpec(memory_space=pltpu.VMEM),   # feats whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights whole
        ],
        out_specs=pl.BlockSpec((BLK, cout), lambda b, s, w: (b, 0)),
        scratch_shapes=[pltpu.VMEM((BLK, cout), jnp.float32),
                        pltpu.VMEM((3 * BLK, WIN), feats_p.dtype)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_pad, cout), jnp.float32),
        interpret=INTERPRET,
    )(plan["starts"], plan["wcnt"], plan["base"], plan["bits"],
      feats_p, w_cols)


def _dw_kernel(ncols, cin, cout, starts_ref, wcnt_ref, base_ref, bits_ref,
               featsb_ref, dout_ref, dw_ref, dwacc_ref):
    """Grid (nb,): accumulate dW[ncols*3, cin, cout] over all blocks.

    dW[col j, slot s] += feats_block^T @ D_js where D_js is the slot-masked
    gather of DOUT rows (the transpose pairing of the forward: enumerate
    (input, output) pairs by input row). featsb is the [BLK, cin] block of
    feats (blocked input); dout is whole in VMEM (windows gathered).
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)

    f32 = jnp.float32
    fb = featsb_ref[:]                               # [BLK, cin]
    for j in range(ncols):
        loc_abs = base_ref[j, :]
        bits = bits_ref[j, :]

        def body(wnd, _, j=j, loc_abs=loc_abs, bits=bits):
            start = pl.multiple_of(starts_ref[j, b, wnd], 8)
            window = dout_ref[pl.ds(start, WIN), :]
            gm, g0, gp = _slot_gathers(loc_abs, bits, start, window)
            dims = (((0,), (0,)), ((), ()))
            dwacc_ref[3 * j] += jax.lax.dot_general(
                fb, gm, dims, preferred_element_type=f32)
            dwacc_ref[3 * j + 1] += jax.lax.dot_general(
                fb, g0, dims, preferred_element_type=f32)
            dwacc_ref[3 * j + 2] += jax.lax.dot_general(
                fb, gp, dims, preferred_element_type=f32)
            return 0

        jax.lax.fori_loop(0, wcnt_ref[j, b], body, 0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dwacc_ref[:]


def _run_dw(feats_p, dout_p, plan, cin, cout):
    np_pad = plan["n_pad"]
    ncols = plan["ncols"]
    nb = np_pad // BLK
    kern = partial(_dw_kernel, ncols, cin, cout)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ncols, BLK), lambda b, s, w: (0, b)),  # base blk
            pl.BlockSpec((ncols, BLK), lambda b, s, w: (0, b)),  # bits blk
            pl.BlockSpec((BLK, cin), lambda b, s, w: (b, 0)),    # feats blk
            pl.BlockSpec(memory_space=pltpu.VMEM),               # dout whole
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),       # dW whole
        scratch_shapes=[pltpu.VMEM((3 * ncols, cin, cout), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3 * ncols, cin, cout), jnp.float32),
        interpret=INTERPRET,
    )(plan["starts"], plan["wcnt"], plan["base"], plan["bits"],
      feats_p, dout_p)


# -------------------------------------------------------------- wrappers --


def _w_to_cols(weights, offsets_key, cdt):
    """[K, Cin, Cout] -> [ncols*3, Cin, Cout] in column-plan slot order."""
    win_cols, _ = _COLUMN_PLANS[offsets_key]
    order = []
    for _is_center, rows in win_cols:
        order.extend(rows)
    return weights[jnp.asarray(np.asarray(order))].astype(cdt)


def _w_to_cols_flipped(weights, offsets_key, cdt):
    """Backward weights: W[flip(row)]^T laid out in the same slot order."""
    k = weights.shape[0]
    flip = np.arange(k)[::-1]
    win_cols, _ = _COLUMN_PLANS[offsets_key]
    order = []
    for _is_center, rows in win_cols:
        order.extend(rows)
    w_t = jnp.swapaxes(weights, 1, 2)[jnp.asarray(flip[np.asarray(order)])]
    return w_t.astype(cdt)


def _dw_unorder(dw_cols, offsets_key):
    """Inverse of the fwd slot ordering + offset flip for the dW pass."""
    win_cols, _ = _COLUMN_PLANS[offsets_key]
    order = []
    for _is_center, rows in win_cols:
        order.extend(rows)
    k = len(order)
    flip = np.arange(k)[::-1]
    # dW pass slot o holds dW[flip(order[o])]
    dest = flip[np.asarray(order)]
    inv = np.empty(k, np.int64)
    inv[dest] = np.arange(k)
    return dw_cols[jnp.asarray(inv)]


def _pad_rows(x, np_pad):
    n = x.shape[0]
    if n == np_pad:
        return x
    return jnp.pad(x, ((0, np_pad - n), (0, 0)))


def _fwd_or_fallback(feats, weights, kmap, offsets_key, cdt, plan):
    """lax.cond between the pallas kernel and the XLA window conv."""
    cdt = jnp.dtype(cdt).type if not isinstance(cdt, type) else cdt
    def pallas_branch(feats, weights):
        # stage WIN extra zero rows so the top window never over-runs
        # (greedy starts are <= max base <= N-1; end <= N-1+WIN)
        sdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
        fp = _pad_rows(feats.astype(sdt), plan["n_pad"] + WIN)
        wc = _w_to_cols(weights, offsets_key, sdt)
        out = _run_fwd(fp, wc, plan)
        return out[: feats.shape[0]]

    def xla_branch(feats, weights):
        return _window_conv_impl(feats, weights, kmap, offsets_key, cdt)

    return jax.lax.cond(
        plan["overflow"], xla_branch, pallas_branch, feats, weights)


def _plan_from_args(base, bits, starts, wcnt, overflow):
    return dict(base=base, bits=bits, starts=starts, wcnt=wcnt,
                overflow=overflow, n_pad=base.shape[1],
                ncols=base.shape[0])


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _pallas_conv_core(feats, weights, offsets_key, compute_dtype, kmap,
                      plan_base, plan_bits, plan_starts, plan_wcnt,
                      plan_overflow):
    plan = _plan_from_args(plan_base, plan_bits, plan_starts, plan_wcnt,
                           plan_overflow)
    return _fwd_or_fallback(feats, weights, kmap, offsets_key,
                            compute_dtype, plan)


def _core_fwd(feats, weights, offsets_key, compute_dtype, kmap,
              plan_base, plan_bits, plan_starts, plan_wcnt, plan_overflow):
    out = _pallas_conv_core(feats, weights, offsets_key, compute_dtype,
                            kmap, plan_base, plan_bits, plan_starts,
                            plan_wcnt, plan_overflow)
    return out, (feats, weights, kmap, plan_base, plan_bits, plan_starts,
                 plan_wcnt, plan_overflow)


def _core_bwd(offsets_key, compute_dtype, res, dout):
    (feats, weights, kmap, plan_base, plan_bits, plan_starts,
     plan_wcnt, plan_overflow) = res
    plan = _plan_from_args(plan_base, plan_bits, plan_starts, plan_wcnt,
                           plan_overflow)
    k, cin, cout = weights.shape
    cdt = compute_dtype

    def pallas_branch(feats, weights, dout):
        # window-staged operands get WIN slack rows; the blocked feats
        # input is exactly grid-sized
        sdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
        dp = _pad_rows(dout.astype(sdt), plan["n_pad"] + WIN)
        fp = _pad_rows(feats.astype(sdt), plan["n_pad"])
        wt = _w_to_cols_flipped(weights, offsets_key, sdt)
        dfeats = _run_fwd(dp, wt, plan)[: feats.shape[0]]
        dw_cols = _run_dw(fp, dp, plan, cin, cout)
        dw = _dw_unorder(dw_cols, offsets_key)
        return dfeats, dw

    def xla_branch(feats, weights, dout):
        from .sparse_conv import _window_bwd
        dfeats, dw, _ = _window_bwd(
            offsets_key, cdt, (feats, weights, kmap), dout)
        return dfeats.astype(jnp.float32), dw.astype(jnp.float32)

    dfeats, dw = jax.lax.cond(
        plan_overflow, xla_branch, pallas_branch, feats, weights, dout)
    return (dfeats.astype(feats.dtype), dw.astype(weights.dtype), None,
            None, None, None, None, None)


_pallas_conv_core.defvjp(_core_fwd, _core_bwd)


# VMEM budget for a window-staged operand ([Np+WIN, C] feats or dout) and
# for dout + dW-scratch together in the dW pass. ~16 MB/core total minus
# one-hot working set (~6 MB) and double-buffered block IO.
_VMEM_OPERAND_BUDGET = 9 * 2 ** 20


def _stage_bytes(n_pad, c, dtype_bytes=2):
    return (n_pad + WIN) * c * dtype_bytes


def _core_call(feats, weights, key, compute_dtype, kmap, plan):
    return _pallas_conv_core(
        feats, weights, key, compute_dtype, kmap,
        plan["base"], plan["bits"], plan["starts"], plan["wcnt"],
        plan["overflow"])


def _split_conv(feats, weights, key, compute_dtype, kmap, plan):
    """Recursive channel split so every kernel pass fits VMEM.

    Splitting Cin halves the forward feats staging and dW scratch rows;
    splitting Cout halves the backward dout staging and dW scratch cols.
    The conv is linear in both, so sub-results sum (Cin) / concat (Cout).
    """
    k, cin, cout = weights.shape
    n_pad = plan["n_pad"]
    dwacc = 3 * plan["ncols"] * cin * cout * 4
    fwd_over = _stage_bytes(n_pad, cin) > _VMEM_OPERAND_BUDGET
    bwd_over = (_stage_bytes(n_pad, cout) + dwacc) > _VMEM_OPERAND_BUDGET
    if fwd_over and cin >= 2 and cin % 2 == 0:
        h = cin // 2
        return (
            _split_conv(feats[:, :h], weights[:, :h], key, compute_dtype,
                        kmap, plan)
            + _split_conv(feats[:, h:], weights[:, h:], key, compute_dtype,
                          kmap, plan))
    if bwd_over and cout >= 2 and cout % 2 == 0:
        h = cout // 2
        return jnp.concatenate([
            _split_conv(feats, weights[:, :, :h], key, compute_dtype,
                        kmap, plan),
            _split_conv(feats, weights[:, :, h:], key, compute_dtype,
                        kmap, plan),
        ], axis=1)
    return _core_call(feats, weights, key, compute_dtype, kmap, plan)


def pallas_window_subm_conv(
    feats: jax.Array,       # [N, Cin] sorted rows, padding zero
    weights: jax.Array,     # [K, Cin, Cout]
    kmap: jax.Array,        # [K, N] submanifold map (-1 miss)
    out_valid: jax.Array,   # [N]
    offsets: np.ndarray,    # [K, 3] kernel offsets
    *,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Drop-in replacement for sparse_conv.window_subm_conv (same maths,
    oracle-tested; pallas kernel on TPU, XLA fallback on overflow)."""
    assert kmap.shape[1] == feats.shape[0]
    key = _plan_key(offsets)
    plan = build_window_plan(kmap, key)
    out = _split_conv(feats, weights, key, compute_dtype, kmap, plan)
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))
