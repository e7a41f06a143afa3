"""Pallas TPU kernel for the devoxelize BACKWARD (dout -> dvox transpose).

The trilinear devoxelize forward is 8 row gathers (ops/voxelize.py
_devox_apply, reference torchsparse devoxelize_cuda.cu:11-33); its autodiff
backward is 8 scatter-adds over [N] point rows — profiled at ~20 ms/step on
the MinkUNet bench (HBM-resident random RMW; see tools/perf/
devox_bwd_probe.py). The round-2 scatter-free XLA rewrite (cumsum over
[8N, C] f32, voxelize.py _devox_bwd) moved MORE bytes than the scatter at
the classifier's C >= 96 levels and lost.

This kernel computes dvox[v] = sum_k sum_{p: idx[k,p]==v} w[k,p] * dout[p]
with the same weighted one-hot MXU trick as ops/pallas_conv.py, exploiting
the run structure instead of scattering:

- point rows are key-sorted, so per corner k the contributor rows of a
  block of VBLK consecutive voxels form ONE contiguous span
  [min lo, max hi] (voxelize.py devox_transpose_bounds) — covered by
  consecutive aligned windows, ceil(span/DWIN) items per (corner, block);
- per item, dout[start:start+DWIN, :C] plus that window's idx / weight
  rows are DMA'd (double-buffered, same flat-item pipeline as the conv
  kernel);
- the weighted one-hot oh[i, j] = (idx_win[j] == v0 + i) * w_win[j] folds
  the trilinear weight into the gather matrix, so ONE [VBLK, DWIN] @
  [DWIN, C] MXU dot per item replaces DWIN scatter-adds — total items
  ~= 8*N/DWIN per devox level, independent of V.

Weights multiply in the compute dtype (bf16), matching the forward's
``weights.astype(voxel_feats.dtype)`` cast (voxelize.py _devox_apply), so
the oracle parity is exact at the autodiff path's own precision.

Default off (OPENPCSEG_DEVOX_PALLAS=1 to enable) until TPU-validated;
exactness is oracle-tested against autodiff in interpret mode
(tests/test_pallas_devox.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from .pallas_conv import NSLOT, VMEM_LIMIT

INTERPRET = False  # tests set True on CPU

VBLK = int(_os.environ.get("OPENPCSEG_DEVOX_VBLK", 512))   # voxels per step
DWIN = int(_os.environ.get("OPENPCSEG_DEVOX_WIN", 2048))   # point rows/window
DNWT = int(_os.environ.get("OPENPCSEG_DEVOX_NWT", 128))    # max items/block


def use_pallas_devox() -> bool:
    return _os.environ.get("OPENPCSEG_DEVOX_PALLAS", "0") == "1"


def _lanes(c: int) -> int:
    return -(-c // 128) * 128


# ------------------------------------------------------------------ plan --


def build_devox_plan(lo: jax.Array, hi: jax.Array, num_voxels: int,
                     n_points: int) -> dict:
    """Window plan for the transpose: per (corner, voxel-block), consecutive
    8-aligned DWIN-windows covering the block's contributor span.

    lo/hi [8, V] from devox_transpose_bounds (lo=N / hi=-1 for empty).
    Returns flat it_off [nvb*9], it_col/it_start [nvb*DNWT] (the same flat
    SMEM layout as pallas_conv's plan — Mosaic pads each SMEM operand's
    last dim to 128 lanes, so 1-D is mandatory at batch >= 2), plus the
    padded voxel count and an overflow flag (a span needing > per-corner
    share of DNWT windows -> XLA fallback).
    """
    k8, v = lo.shape
    v_pad = -(-v // VBLK) * VBLK
    nvb = v_pad // VBLK
    big = jnp.int32(2 ** 30)
    n_ceil = -(-n_points // 8) * 8

    lo_p = jnp.pad(lo, ((0, 0), (0, v_pad - v)), constant_values=2 ** 30)
    hi_p = jnp.pad(hi, ((0, 0), (0, v_pad - v)), constant_values=-1)
    lo_b = jnp.where(hi_p >= 0, lo_p, big).reshape(k8, nvb, VBLK)
    hi_b = hi_p.reshape(k8, nvb, VBLK)
    span_lo = jnp.min(lo_b, axis=2)                       # [8, nvb]
    span_hi = jnp.max(hi_b, axis=2)
    has = span_hi >= 0
    start0 = jnp.where(has, (jnp.minimum(span_lo, span_hi) // 8) * 8, 0)
    cnt = jnp.where(has, (span_hi - start0) // DWIN + 1, 0).astype(jnp.int32)
    overflow = jnp.any(jnp.sum(cnt, axis=0) > DNWT)
    cnt = jnp.minimum(cnt, DNWT)

    # flat item list per block, corner-major (same construction as
    # pallas_conv.build_window_plan)
    offs = jnp.concatenate(
        [jnp.zeros((1, nvb), jnp.int32), jnp.cumsum(cnt, axis=0)], axis=0
    )                                                     # [9, nvb]
    total = offs[-1]
    wi = jnp.arange(DNWT, dtype=jnp.int32)
    starts = start0[..., None] + wi[None, None, :] * DWIN  # [8, nvb, DNWT]
    starts = jnp.clip(starts, 0, n_ceil)   # spurious prefetch stays staged
    dest = jnp.where(wi[None, None, :] < cnt[..., None],
                     offs[:-1][..., None] + wi[None, None, :], DNWT)
    dflat = dest.transpose(1, 0, 2).reshape(nvb, k8 * DNWT)
    sflat = starts.transpose(1, 0, 2).reshape(nvb, k8 * DNWT)
    cflat = jnp.broadcast_to(
        jnp.repeat(jnp.arange(k8, dtype=jnp.int32), DNWT)[None],
        (nvb, k8 * DNWT))
    _, it_start, it_col = jax.lax.sort(
        (dflat, sflat, cflat), num_keys=1, dimension=1)
    it_start = it_start[:, :DNWT]
    it_col = it_col[:, :DNWT]
    overflow = overflow | jnp.any(total > DNWT)
    it_off = jnp.minimum(offs.T, DNWT).astype(jnp.int32)   # [nvb, 9]
    return dict(it_off=it_off.reshape(-1), it_col=it_col.reshape(-1),
                it_start=it_start.reshape(-1),
                overflow=overflow, v_pad=v_pad, nvb=nvb, n_stage=n_ceil + DWIN)


# ---------------------------------------------------------------- kernel --


def _devox_bwd_kernel(cl_pad, nvb, itoff_ref, itcol_ref, itst_ref,
                      d_hbm, idx_hbm, w_hbm, o_ref, acc_ref,
                      dwin_ref, iwin_ref, wwin_ref, sem_d, sem_i, sem_w):
    """Grid (nvb,): one VBLK-voxel output block per step.

    d_hbm   [n_stage, cl_pad]  staged dout rows (bf16, zero past N)
    idx_hbm [8, 8, n_stage]    per-corner idx rows (sublane-padded x8; only
                               row 0 is live — Mosaic requires 8-multiple
                               sublane extents on DMA'd slices)
    w_hbm   [8, 8, n_stage]    per-corner weight rows (bf16 like the
                               forward's cast; row 0 live)
    """
    b = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    f32 = jnp.float32
    cdt = dwin_ref.dtype
    v0 = b * VBLK
    total = itoff_ref[b * 9 + 8]

    def st(i):
        return pl.multiple_of(
            itst_ref[b * DNWT + jnp.minimum(i, DNWT - 1)], 8)

    def col(i):
        return itcol_ref[b * DNWT + jnp.minimum(i, DNWT - 1)]

    def dmas(slot, i):
        return (
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(st(i), DWIN), :], dwin_ref.at[slot],
                sem_d.at[slot]),
            pltpu.make_async_copy(
                idx_hbm.at[col(i), :, pl.ds(st(i), DWIN)], iwin_ref.at[slot],
                sem_i.at[slot]),
            pltpu.make_async_copy(
                w_hbm.at[col(i), :, pl.ds(st(i), DWIN)], wwin_ref.at[slot],
                sem_w.at[slot]),
        )

    for i0 in range(NSLOT - 1):
        @pl.when(i0 < total)
        def _():
            for cp in dmas(i0 % NSLOT, i0):
                cp.start()

    def body(i, _):
        slot = i % NSLOT

        @pl.when(i + NSLOT - 1 < total)
        def _():
            for cp in dmas((i + NSLOT - 1) % NSLOT, i + NSLOT - 1):
                cp.start()

        for cp in dmas(slot, i):
            cp.wait()
        # weighted one-hot: rows = voxels of this block (sublanes), cols =
        # point rows (lanes); idx/w arrive lane-oriented [8, DWIN], row 0
        # live — slice reads are fine, only sub-128-lane WRITES are slow
        idx_w = iwin_ref[slot, 0:1, :]                      # [1, DWIN] i32
        w_w = wwin_ref[slot, 0:1, :]                        # [1, DWIN]
        iota = jax.lax.broadcasted_iota(jnp.int32, (VBLK, DWIN), 0) + v0
        oh = (iota == idx_w).astype(cdt) * w_w.astype(cdt)
        acc_ref[:] += jnp.dot(oh, dwin_ref[slot],
                              preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, total, body, 0)
    o_ref[:] = acc_ref[:]


def _run_devox_bwd(d_p, idx_p, w_p, plan):
    nvb = plan["nvb"]
    v_pad = plan["v_pad"]
    cl_pad = d_p.shape[1]
    kern = partial(_devox_bwd_kernel, cl_pad, nvb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nvb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # dout rows, HBM
            pl.BlockSpec(memory_space=pl.ANY),    # idx rows, HBM
            pl.BlockSpec(memory_space=pl.ANY),    # weight rows, HBM
        ],
        out_specs=pl.BlockSpec((VBLK, cl_pad), lambda b, o, cl, s: (b, 0)),
        scratch_shapes=[pltpu.VMEM((VBLK, cl_pad), jnp.float32),
                        pltpu.VMEM((NSLOT, DWIN, cl_pad), d_p.dtype),
                        pltpu.VMEM((NSLOT, 8, DWIN), idx_p.dtype),
                        pltpu.VMEM((NSLOT, 8, DWIN), w_p.dtype),
                        pltpu.SemaphoreType.DMA((NSLOT,)),
                        pltpu.SemaphoreType.DMA((NSLOT,)),
                        pltpu.SemaphoreType.DMA((NSLOT,))],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad, cl_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(plan["it_off"], plan["it_col"], plan["it_start"], d_p, idx_p, w_p)


# -------------------------------------------------------------- wrapper --


def devox_transpose_pallas(
    dout: jax.Array,      # [N, C] point cotangent
    idx: jax.Array,       # [8, N] int32 corner voxel rows (-1 miss)
    weights: jax.Array,   # [8, N] trilinear weights (zero on miss)
    lo: jax.Array,        # [8, V] run bounds (devox_transpose_bounds)
    hi: jax.Array,        # [8, V]
    num_voxels: int,
    *,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """dvox [V, C] f32 = scatter-free transpose of the devoxelize gather."""
    k8, n = idx.shape
    v = num_voxels
    c = dout.shape[1]
    cl_pad = _lanes(c)
    plan = build_devox_plan(lo, hi, v, n)
    n_stage = plan["n_stage"]

    def pallas_branch(dout, idx, weights):
        d_p = jnp.zeros((n_stage, cl_pad), compute_dtype).at[:n, :c].set(
            dout.astype(compute_dtype))
        idx_p = jnp.full((k8, 8, n_stage), -1, jnp.int32).at[:, 0, :n].set(idx)
        w_p = jnp.zeros((k8, 8, n_stage), compute_dtype).at[:, 0, :n].set(
            weights.astype(compute_dtype))
        dvox_p = _run_devox_bwd(d_p, idx_p, w_p, plan)
        return dvox_p[:v, :c]

    def xla_branch(dout, idx, weights):
        # autodiff-equivalent 8 scatter-adds (the baseline this replaces)
        out = jnp.zeros((v, c), jnp.float32)
        d16 = dout.astype(compute_dtype)
        for k in range(k8):
            contrib = (d16 * weights[k][:, None].astype(compute_dtype)
                       ).astype(jnp.float32)
            out = out.at[jnp.maximum(idx[k], 0)].add(
                jnp.where((idx[k] >= 0)[:, None], contrib, 0.0))
        return out

    return jax.lax.cond(plan["overflow"], xla_branch, pallas_branch,
                        dout, idx, weights)
