"""Pallas TPU kernels for the k2/s2 strided (down) and transposed (up)
sparse convs — the window one-hot machinery of ops/pallas_conv.py applied
to the up/down kernel maps (reference hot path replaced: torchsparse
gather-GEMM-scatter over the downsample maps, conv.py:122-205).

Structural facts exploited (see core/geometry.py _updown_from_inverse):

- DOWN map ``kmap[8, Nc]`` (coarse output -> fine input): for each (dx, dy)
  column the two z-slot rows are KEY-ADJACENT when both exist (same
  (b, x, y), consecutive z sort adjacently), so one raw [win, C] window of
  the fine table serves both slots — rows loc and loc + 1. Bases are
  monotone per column (both tables key-sorted).
- UP map: every fine output matches exactly ONE coarse input (its parent,
  at the offset given by its coordinate parity), and ``parent(f)`` is
  monotone in f — one window of the coarse table per block, one one-hot
  gather, then 8 parity-masked weight dots.

Four passes, two kernel shapes:

  pair-gather   (grid over coarse blocks): down-fwd, up-bwd(+dW)
  parent-gather (grid over fine blocks):   up-fwd,  down-bwd(+dW)

No w3 staging (raw feature windows), no scatters anywhere. Exactness: the
window plans are value-covering; overflow falls back to the XLA paths
(ops/sparse_conv.py) via lax.cond (or NaN-poisons under
OPENPCSEG_PALLAS_STRICT, like the subm conv kernel).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import (NSLOT, VMEM_LIMIT, _pipeline_helpers,
                          _poison, _strict, plan_cover)

INTERPRET = False  # tests set True on CPU

import os as _os

BLK = int(_os.environ.get("OPENPCSEG_UPDOWN_BLK", 512))
WIN = int(_os.environ.get("OPENPCSEG_UPDOWN_WIN", 512))


def _lanes(c: int) -> int:
    return -(-c // 128) * 128


def _stage_src(x, win, cdt):
    """[n, c] -> [ceil8(n) + win, lanes(c)] in cdt, zero padded (the parked
    window starts chain past the data; clip_max keeps DMAs inside)."""
    n, c = x.shape
    rows = -(-n // 8) * 8 + win
    out = jnp.zeros((rows, _lanes(c)), cdt)
    return out.at[:n, :c].set(x.astype(cdt))


# ------------------------------------------------------------------ plans --


def build_pair_plan(kmap: jax.Array, n_src: int, blk: int | None = None,
                    win: int | None = None) -> dict:
    """Plan for the pair-gather kernel from a down map ``kmap[8, Nc]``.

    Columns are the 4 (dx, dy) pairs; z slots are rows (2c, 2c+1) of the
    kernel-offsets order (index = px*4 + py*2 + pz). bits: bit0 = slot-z0
    at loc, bit1 = slot-z1 at loc, bit2 = slot-z1 at loc + 1. span=1
    (loc + 1 must sit in the same window). ``n_src`` is the GATHERED
    table's row count (the fine table here — NOT kmap's output count):
    window starts are clipped so every DMA stays inside the staged
    [ceil8(n_src) + win] source rows.
    """
    blk = BLK if blk is None else blk
    win = WIN if win is None else win
    n = kmap.shape[1]
    np_pad = -(-n // blk) * blk
    clip = -(-n_src // 8) * 8

    bases, bits_l = [], []
    for c in range(4):
        r0, r1 = kmap[2 * c], kmap[2 * c + 1]
        h0, h1 = r0 >= 0, r1 >= 0
        base = jnp.where(h0, r0, jnp.where(h1, r1, 0))
        bits = (h0.astype(jnp.int32)
                | ((h1 & ~h0).astype(jnp.int32) << 1)
                | ((h1 & h0).astype(jnp.int32) << 2))
        hit = h0 | h1
        bases.append(jnp.where(hit, jnp.maximum(base, 0), 0))
        bits_l.append(jnp.where(hit, bits, 0))
    base = jnp.stack(bases)
    bits = jnp.stack(bits_l)
    if np_pad != n:
        pad = ((0, 0), (0, np_pad - n))
        base = jnp.pad(base, pad)
        bits = jnp.pad(bits, pad)
    cov = plan_cover(base, bits != 0, blk, win, clip_max=clip, span=1)
    cov.update(base=base, bits=bits, n_pad=np_pad, blk=blk, win=win,
               ncols=4)
    return cov


def build_parent_plan(up_kmap: jax.Array, n_src: int,
                      blk: int | None = None,
                      win: int | None = None) -> dict:
    """Plan for the parent-gather kernel from an up map ``up_kmap[8, Nf]``
    (at most one non-negative row per output). parity in [0, 8) is the
    matching offset; parked/miss rows get parity 8 (masked everywhere).
    ``n_src`` = gathered (coarse) table rows — see build_pair_plan."""
    blk = BLK if blk is None else blk
    win = WIN if win is None else win
    n = up_kmap.shape[1]
    np_pad = -(-n // blk) * blk
    clip = -(-n_src // 8) * 8
    parent = jnp.max(up_kmap, axis=0)
    hit = parent >= 0
    parity = jnp.argmax((up_kmap >= 0).astype(jnp.int32), axis=0)
    parity = jnp.where(hit, parity, 8).astype(jnp.int32)
    base = jnp.where(hit, parent, 0)
    if np_pad != n:
        base = jnp.pad(base, (0, np_pad - n))
        hit = jnp.pad(hit, (0, np_pad - n))
        parity = jnp.pad(parity, (0, np_pad - n), constant_values=8)
    cov = plan_cover(base[None], hit[None], blk, win, clip_max=clip)
    cov.update(base=base[None], parity=parity[None], n_pad=np_pad, blk=blk,
               win=win, ncols=1)
    return cov


# ---------------------------------------------------------------- kernels --
#
# Shared ref layout (after the 3 scalar-prefetch SMEM refs):
#   inputs : base [ncols, blk], aux [ncols, blk], src (HBM), w [8, cs, cd]
#            [, fb [blk, cf]]
#   outputs: o [blk, cd] [, dw [8, cf, cs]]
#   scratch: acc [blk, cd] f32, oh [blk, win], winbuf [NSLOT, win, lanes],
#            [dwacc [8, cf, cs] f32,] sem
# cs = gathered-source width, cd = output width, cf = fb width.


def _pair_kernel(want_dw, cs, cd, blk, win,
                 itoff_ref, itcol_ref, itst_ref,
                 base_ref, bits_ref, *refs):
    if want_dw:
        (src_hbm, w_ref, fb_ref, o_ref, dw_ref,
         acc_ref, oh_ref, win_ref, dwacc_ref, sem) = refs
    else:
        (src_hbm, w_ref, o_ref, acc_ref, oh_ref, win_ref, sem) = refs
    b = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    if want_dw:
        @pl.when(b == 0)
        def _():
            dwacc_ref[:] = jnp.zeros_like(dwacc_ref)
        fb = fb_ref[:]
    f32 = jnp.float32
    cdt = win_ref.dtype
    total, st, dma, warmup = _pipeline_helpers(
        4, b, itoff_ref, itst_ref, win_ref, sem, src_hbm, win)
    warmup()

    def col_body(j):
        bits2 = bits_ref[j, :][:, None]
        m00 = ((bits2 & 1) > 0).astype(cdt)
        m10 = ((bits2 & 2) > 0).astype(cdt)
        m11 = ((bits2 & 4) > 0).astype(cdt)

        def body(i, _):
            slot = i % NSLOT

            @pl.when(i + NSLOT - 1 < total)
            def _():
                dma((i + NSLOT - 1) % NSLOT, st(i + NSLOT - 1)).start()

            dma(slot, st(i)).wait()
            loc = base_ref[j, :] - st(i)
            # span=1 windows may overlap by one row: clamp out-of-window
            # rows to -2 so neither loc nor loc+1 matches the iota (the
            # covering window is unique under `< win - 1`; without the
            # clamp a base at a neighbor window's last slot double-counts)
            loc = jnp.where((loc >= 0) & (loc < win - 1), loc, -2)
            iota = jax.lax.broadcasted_iota(jnp.int32, (blk, win), 1)
            at0 = (iota == loc[:, None]).astype(cdt)
            at1 = (iota == (loc + 1)[:, None]).astype(cdt)
            oh_ref[:] = at0 * m00
            g0 = jnp.dot(oh_ref[:], win_ref[slot],
                         preferred_element_type=f32).astype(cdt)[:, :cs]
            oh_ref[:] = at0 * m10 + at1 * m11
            g1 = jnp.dot(oh_ref[:], win_ref[slot],
                         preferred_element_type=f32).astype(cdt)[:, :cs]
            acc_ref[:] += jnp.dot(g0, w_ref[2 * j],
                                  preferred_element_type=f32)
            acc_ref[:] += jnp.dot(g1, w_ref[2 * j + 1],
                                  preferred_element_type=f32)
            if want_dw:
                dims = (((0,), (0,)), ((), ()))
                dwacc_ref[2 * j] += jax.lax.dot_general(
                    fb, g0, dims, preferred_element_type=f32)
                dwacc_ref[2 * j + 1] += jax.lax.dot_general(
                    fb, g1, dims, preferred_element_type=f32)
            return 0

        lo = itoff_ref[b * 5 + j]
        hi = itoff_ref[b * 5 + j + 1]
        jax.lax.fori_loop(lo, hi, body, 0)

    for j in range(4):
        col_body(j)
    o_ref[:] = acc_ref[:]
    if want_dw:
        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            dw_ref[:] = dwacc_ref[:]


def _parent_kernel(want_dw, cs, cd, blk, win,
                   itoff_ref, itcol_ref, itst_ref,
                   base_ref, par_ref, *refs):
    if want_dw:
        (src_hbm, w_ref, fb_ref, o_ref, dw_ref,
         acc_ref, oh_ref, win_ref, dwacc_ref, sem) = refs
    else:
        (src_hbm, w_ref, o_ref, acc_ref, oh_ref, win_ref, sem) = refs
    b = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    if want_dw:
        @pl.when(b == 0)
        def _():
            dwacc_ref[:] = jnp.zeros_like(dwacc_ref)
        fb = fb_ref[:]
    f32 = jnp.float32
    cdt = win_ref.dtype
    total, st, dma, warmup = _pipeline_helpers(
        1, b, itoff_ref, itst_ref, win_ref, sem, src_hbm, win)
    warmup()
    par2 = par_ref[0, :][:, None]
    hitm_i = (par2 < 8)

    def body(i, _):
        slot = i % NSLOT

        @pl.when(i + NSLOT - 1 < total)
        def _():
            dma((i + NSLOT - 1) % NSLOT, st(i + NSLOT - 1)).start()

        dma(slot, st(i)).wait()
        loc = base_ref[0, :] - st(i)
        iota = jax.lax.broadcasted_iota(jnp.int32, (blk, win), 1)
        oh_ref[:] = ((iota == loc[:, None]) & hitm_i).astype(cdt)
        g = jnp.dot(oh_ref[:], win_ref[slot],
                    preferred_element_type=f32).astype(cdt)[:, :cs]
        for k in range(8):
            mk = (par2 == k).astype(cdt)
            gk = g * mk
            acc_ref[:] += jnp.dot(gk, w_ref[k],
                                  preferred_element_type=f32)
            if want_dw:
                dwacc_ref[k] += jax.lax.dot_general(
                    fb, gk, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
        return 0

    lo = itoff_ref[b * 2 + 0]
    hi = itoff_ref[b * 2 + 1]
    jax.lax.fori_loop(lo, hi, body, 0)
    o_ref[:] = acc_ref[:]
    if want_dw:
        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            dw_ref[:] = dwacc_ref[:]


# ------------------------------------------------------------------- run --


def _run(kern_fn, plan, aux2, src, w, fb, cdt):
    """src [ns, cs]; w [8, cs, cd]; fb [N, cf] or None.
    Returns out [n_pad, cd] f32 (+ dw [8, cf, cs=w.shape[1]? no: [8, cf,
    gathered width cs] — callers interpret; see the pass wrappers)."""
    np_pad = plan["n_pad"]
    blk, win = plan["blk"], plan["win"]
    nb = np_pad // blk
    ncols = plan["ncols"]
    cs, cd = w.shape[1], w.shape[2]
    assert src.shape[1] == cs
    src_p = _stage_src(src, win, cdt)
    w_p = w.astype(cdt)
    want_dw = fb is not None
    kern = partial(kern_fn, want_dw, cs, cd, blk, win)

    in_specs = [
        pl.BlockSpec((ncols, blk), lambda b, o, cl, s: (0, b)),   # base
        pl.BlockSpec((ncols, blk), lambda b, o, cl, s: (0, b)),   # aux
        pl.BlockSpec(memory_space=pl.ANY),                        # src HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # weights
    ]
    args = [plan["it_off"], plan["it_col"], plan["it_start"],
            plan["base"], aux2, src_p, w_p]
    scratch = [pltpu.VMEM((blk, cd), jnp.float32),
               pltpu.VMEM((blk, win), cdt),
               pltpu.VMEM((NSLOT, win, src_p.shape[1]), cdt)]
    if want_dw:
        cf = fb.shape[1]
        fb_p = jnp.zeros((np_pad, cf), cdt).at[:fb.shape[0]].set(
            fb.astype(cdt))
        in_specs.append(
            pl.BlockSpec((blk, cf), lambda b, o, cl, s: (b, 0)))
        args.append(fb_p)
        out_shape = (jax.ShapeDtypeStruct((np_pad, cd), jnp.float32),
                     jax.ShapeDtypeStruct((8, cf, cs), jnp.float32))
        out_specs = (pl.BlockSpec((blk, cd), lambda b, o, cl, s: (b, 0)),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((8, cf, cs), jnp.float32))
    else:
        out_shape = jax.ShapeDtypeStruct((np_pad, cd), jnp.float32)
        out_specs = pl.BlockSpec((blk, cd), lambda b, o, cl, s: (b, 0))
    scratch.append(pltpu.SemaphoreType.DMA((NSLOT,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(nb,),
        in_specs=in_specs, out_specs=out_specs, scratch_shapes=scratch)
    vmem = max(VMEM_LIMIT,
               int((8 * max(cs, 128) * max(cd, 128) * 12
                    + NSLOT * win * src_p.shape[1] * 2
                    + blk * (win + 4 * max(cd, cs) + 512) * 4) * 1.3))
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=INTERPRET,
    )(*args)


# ------------------------------------------------------------ public ops --


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _down2_core(feats, weights, kmap, up_kmap, compute_dtype):
    out, _ = _down2_fwd(feats, weights, kmap, up_kmap, compute_dtype)
    return out


def _down2_fwd(feats, weights, kmap, up_kmap, compute_dtype):
    from .sparse_conv import _conv_apply
    n_out = kmap.shape[1]
    plan = build_pair_plan(kmap, feats.shape[0])

    def pallas_branch(feats, weights):
        out = _run(_pair_kernel, plan, plan["bits"], feats,
                   weights, None, compute_dtype)
        return out[:n_out]

    def xla_branch(feats, weights):
        return _conv_apply(feats, weights, kmap, None, compute_dtype)

    if _strict():
        out = _poison(pallas_branch(feats, weights), plan["overflow"])
    else:
        out = jax.lax.cond(plan["overflow"], xla_branch, pallas_branch,
                           feats, weights)
    return out, (feats, weights, kmap, up_kmap)


def _down2_bwd(compute_dtype, res, dout):
    """dfeats via the parent kernel over dout (coarse side):
    dfeats[i] = dout[parent(i)] @ W[parity(i)]^T;
    dW[k] = sum_{i: parity=k} feats[i]^T dout[parent(i)] — the kernel's
    dwacc[k] = fb^T @ (gathered dout, parity-masked) is exactly that."""
    feats, weights, kmap, up_kmap = res
    cdt = compute_dtype
    n_in = feats.shape[0]
    plan = build_parent_plan(up_kmap, kmap.shape[1])
    w_t = jnp.swapaxes(weights, 1, 2)  # [8, cout, cin]

    def pallas_branch(feats, dout):
        # dw arrives as [8, cf=cin, cs=cout] == dW[k] directly
        df_p, dw = _run(_parent_kernel, plan, plan["parity"], dout,
                        w_t, feats, cdt)
        return df_p[:n_in], dw

    def xla_branch(feats, dout):
        from .sparse_conv import _core_bwd
        df, dw, _, _ = _core_bwd(None, cdt, (feats, weights, kmap, up_kmap),
                                 dout)
        return df.astype(jnp.float32), dw.astype(jnp.float32)

    if _strict():
        df, dw = pallas_branch(feats, dout)
        df = _poison(df, plan["overflow"])
        dw = _poison(dw, plan["overflow"])
    else:
        df, dw = jax.lax.cond(plan["overflow"], xla_branch, pallas_branch,
                              feats, dout)
    return (df.astype(feats.dtype), dw.astype(weights.dtype), None, None)


_down2_core.defvjp(_down2_fwd, _down2_bwd)


def pallas_conv_down2(feats, weights, kmap, out_valid, up_kmap, *,
                      compute_dtype=jnp.bfloat16):
    """k2/s2 strided conv fine->coarse: kmap = down map [8, N_coarse],
    up_kmap = the parity up map [8, N_fine] (the backward's transpose).
    Drop-in for ops.sparse_conv.sparse_conv(…, kmap_t=up_kmap)."""
    out = _down2_core(feats, weights, kmap, up_kmap, compute_dtype)
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _up2_core_pl(feats, weights, up_kmap, down_kmap, compute_dtype):
    out, _ = _up2_fwd_pl(feats, weights, up_kmap, down_kmap, compute_dtype)
    return out


def _up2_fwd_pl(feats, weights, up_kmap, down_kmap, compute_dtype):
    from .sparse_conv import _up2_fwd_impl
    n_out = up_kmap.shape[1]
    plan = build_parent_plan(up_kmap, feats.shape[0])

    def pallas_branch(feats, weights):
        out = _run(_parent_kernel, plan, plan["parity"], feats,
                   weights, None, compute_dtype)
        return out[:n_out]

    def xla_branch(feats, weights):
        return _up2_fwd_impl(feats, weights, up_kmap, compute_dtype)

    if _strict():
        out = _poison(pallas_branch(feats, weights), plan["overflow"])
    else:
        out = jax.lax.cond(plan["overflow"], xla_branch, pallas_branch,
                           feats, weights)
    return out, (feats, weights, up_kmap, down_kmap)


def _up2_bwd_pl(compute_dtype, res, dout):
    """dfeats_c via the pair kernel over dout (fine side):
    dfeats_c[o] = sum_k dout[down_kmap[k, o]] @ W[k]^T;
    dW[k] = sum_o feats_c[o]^T dout[down_kmap[k, o]] — the kernel's
    dwacc[k] = fb^T @ gathered-dout-slot, with fb = the coarse feats."""
    feats, weights, up_kmap, down_kmap = res
    cdt = compute_dtype
    n_in = feats.shape[0]
    plan = build_pair_plan(down_kmap, up_kmap.shape[1])
    w_t = jnp.swapaxes(weights, 1, 2)  # [8, cout, cin]

    def pallas_branch(feats, dout):
        # dw arrives as [8, cf=cin, cs=cout] == dW[k] directly
        df_p, dw = _run(_pair_kernel, plan, plan["bits"], dout,
                        w_t, feats, cdt)
        return df_p[:n_in], dw

    def xla_branch(feats, dout):
        from .sparse_conv import _up2_bwd
        df, dw, _, _ = _up2_bwd(cdt, (feats, weights, down_kmap), dout)
        return df.astype(jnp.float32), dw.astype(jnp.float32)

    if _strict():
        df, dw = pallas_branch(feats, dout)
        df = _poison(df, plan["overflow"])
        dw = _poison(dw, plan["overflow"])
    else:
        df, dw = jax.lax.cond(plan["overflow"], xla_branch, pallas_branch,
                              feats, dout)
    return (df.astype(feats.dtype), dw.astype(weights.dtype), None, None)


_up2_core_pl.defvjp(_up2_fwd_pl, _up2_bwd_pl)


def pallas_conv_up2(feats, weights, up_kmap, out_valid, down_kmap, *,
                    compute_dtype=jnp.bfloat16):
    """k2/s2 transposed conv coarse->fine (one matched pair per output).
    Drop-in for ops.sparse_conv.sparse_conv_up2."""
    out = _up2_core_pl(feats, weights, up_kmap, down_kmap, compute_dtype)
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))
