"""Pallas TPU kernel for the z-window submanifold sparse conv (v3).

Replaces the XLA im2col window conv (sparse_conv.py `_window_apply`) whose
row gathers realize only a few GB/s of HBM bandwidth (BASELINE.md; the conv
path was 224 of 346 ms/step at round 2). Structure (reference hot loop this
replaces: torchsparse backend/convolution/convolution_cuda.cu:14-80
gather-GEMM-scatter):

- rows are sorted by packed (b,x,y,z) keys, so for each kernel column
  (dx,dy) the per-output "base" neighbor row index is MONOTONE in the
  output row; for a block of `BLK` consecutive outputs the bases form 1-2
  contiguous clusters covered exactly by a few disjoint aligned windows
  (`build_window_plan`, mean ~1.1 windows/block);
- the *w3 table* w3[i] = [f[i-1], f[i], f[i+1]] (built once per conv in
  XLA, staged in HBM) makes one window row carry all three z-slots, so ONE
  soft one-hot (iota == local base) per column-window gathers a [BLK, 3C]
  block on the MXU — v2 of this kernel built three mask-folded one-hots
  and dotted [3BLK, WIN] @ [WIN, C], wasting 3/4 of the MXU lanes at C=32
  (48 tile-passes vs 16, measured tools/perf/onehot_v*_probe.py);
- the five window-column masks (sparse_conv.py derivation) apply to the
  *gathered* [BLK, C] slices as bf16 multiplies built from 2-D integer
  compares (sub-128-lane VMEM *writes* are catastrophically slow — ~7 us
  per column-window in probe v2 — so masked slices are only ever READ);
- windows are DMA'd from the HBM w3 table per (column, window) — the whole
  feature table never resides in VMEM, which removes round 2's recursive
  channel splitting and its C=96 scoped-VMEM OOM.

Backward: dfeats is the same kernel over w3(dout) with offset-flipped
transposed weights (symmetric kernels keep the window plan), and the SAME
gathered dout slots feed the dW accumulation — one fused kernel, half the
backward gather/DMA work of the round-2 two-pass backward.

Exactness: window assignment is by value over disjoint windows; blocks
whose cluster spread exceeds the windows set an overflow flag and the call
falls back to the XLA window conv via lax.cond.
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
NW = int(_os.environ.get("OPENPCSEG_PALLAS_NW", 16))      # max windows/col
NWT = int(_os.environ.get("OPENPCSEG_PALLAS_NWT", 64))    # max windows/block
# column grouping: GSIZE consecutive kernel columns (the column plan orders
# them row-major over (dx, dy), so consecutive triples share dx) share ONE
# window cover and one DMA per window. Their bases differ only by a y-step
# (a few z-run lengths in sorted-row space), so the union cover needs barely
# more windows than one column — and the per-item DMA-latency stall, the
# measured bottleneck (see _pipeline_helpers), is paid ~1/GSIZE as often.
# 1 = ungrouped (round-4 behavior), 3 = per-dx grouping.
GSIZE = int(_os.environ.get("OPENPCSEG_PALLAS_GROUP", 1))
# DMA pipeline depth: 4-deep measured slightly WORSE than plain double
# buffering (L0 4.06 vs 3.99 ms, L1 3.67 vs 3.32) — the per-item stall is
# not DMA latency (see _pipeline_helpers), so extra slots only add VMEM
# pressure. Keep the knob for future probing.
NSLOT = int(_os.environ.get("OPENPCSEG_PALLAS_NSLOT", 2))
# scoped-VMEM ceiling for the fused backward: the dW accumulator
# [3*ncols, Cin, Cout] f32 plus weights/windows exceeds the 16 MB default
# at the decoder's 384-in/256-out level (~20 MB); v5e VMEM is larger than
# the default scoped limit, so raise it for our kernels.
VMEM_LIMIT = int(_os.environ.get("OPENPCSEG_PALLAS_VMEM", 32 * 2 ** 20))
# The one-hot dot FLOPs scale with WIN while coverage needs only the
# per-block cluster spread (med ~500, p99 ~2700 on ray-cast scans): WIN=512
# with generous NW wins over fewer, wider windows because the fori_loop
# window count is dynamic (mean ~1.1) and misses are free.


# ------------------------------------------------------------ size policy --
#
# Every kernel item (column-window) pays a fixed ~1-2 us DMA-latency stall
# (see _pipeline_helpers), so FEWER, LARGER items win when VMEM allows:
# doubling (BLK, WIN) halves the item count at roughly constant per-item
# cost. The policy picks the largest (blk, win) pair whose fwd+bwd scratch
# fits the scoped-VMEM budget for the conv's channel widths.
#
#   OPENPCSEG_PALLAS_POLICY=off   -> always the BLK/WIN module defaults
#   OPENPCSEG_PALLAS_POLICY=auto  -> VMEM-model ladder (default)
#   OPENPCSEG_PALLAS_POLICY=b:w,b:w,...  -> explicit ladder, tried in order

def _vmem_cost(blk: int, win: int, ncols: int, cin: int, cout: int) -> int:
    """Upper-bound VMEM bytes for the *backward* kernel (strictly larger
    than the forward: adds the dW accumulator, the feats block and the
    wider-of-the-two staged w3 tables)."""
    lanes = max(-(-3 * cin // 128) * 128, -(-3 * cout // 128) * 128)
    oh = blk * win * 2
    winbuf = NSLOT * win * lanes * 2
    acc = blk * max(cin, cout) * 4 * 2          # acc scratch + blocked out
    dw = 3 * ncols * cin * cout * 4             # dW accumulator (f32)
    w = 3 * ncols * cin * cout * 2 * 2          # wt VMEM + dw out
    feats = blk * cin * 2
    plan = 2 * ncols * blk * 4                  # base + bits blocks
    return oh + winbuf + acc + dw + w + feats + plan


def _vmem_limit_for(ncols: int, cin: int, cout: int, blk: int, win: int
                    ) -> int:
    """Per-call scoped-VMEM ceiling: at least the module default, raised to
    the cost model's estimate (+25% slack) for wide-channel convs — the
    decoder's 384-in/256-out backward needs ~34 MB and a fixed 32 MB limit
    OOMs once the cond wrapper no longer isolates the kernel's liveness
    (observed in the round-5 strict-mode bench)."""
    return max(VMEM_LIMIT,
               int(_vmem_cost(blk, win, ncols, cin, cout) * 1.25))


def _size_policy(ncols: int, cin: int, cout: int) -> Tuple[int, int]:
    """(blk, win) for one conv: largest ladder entry fitting the VMEM
    budget; module BLK/WIN (env-overridable, test-monkeypatchable) are the
    floor and the `off` behavior."""
    # default stays "off" until the auto ladder is TPU-validated (flip
    # after BENCH shows the 2x sizes win end-to-end)
    spec = _os.environ.get("OPENPCSEG_PALLAS_POLICY", "off")
    if spec == "off":
        return BLK, WIN
    if spec == "auto":
        ladder = [(2 * BLK, 2 * WIN)]
    else:
        ladder = [tuple(int(v) for v in e.split(":"))
                  for e in spec.split(",")]
    budget = int(VMEM_LIMIT * 0.85)
    for blk, win in ladder:
        if blk >= BLK and win >= WIN and \
                _vmem_cost(blk, win, ncols, cin, cout) <= budget:
            return blk, win
    return BLK, WIN


# ------------------------------------------------------------------ plan --


def build_window_plan(kmap: jax.Array, offsets_key,
                      blk: int | None = None,
                      win: int | None = None,
                      gsize: int | None = None) -> dict:
    """XLA-side precompute shared by fwd/bwd kernels.

    Returns dict with:
      base  [ncols, Np]   int32 absolute neighbor row (clamped >= 0)
      bits  [ncols, Np]   int32 mask bitfield (a0|a1<<1|b1<<2|c1<<3|c2<<4)
      starts[ncols, nb, NW] int32 8-aligned disjoint window starts
      overflow            bool scalar — some base escaped both windows
    Np is N padded up to a `blk` multiple. Depends only on the kernel map →
    one plan serves every conv at the level (and fwd + bwd share it).
    blk/win default to the module BLK/WIN (see _size_policy for the
    channel-aware selection used by the production entry point).
    """
    blk = BLK if blk is None else blk
    win = WIN if win is None else win
    gsize = GSIZE if gsize is None else gsize
    win_cols, plain = _COLUMN_PLANS[offsets_key]
    assert not plain, "pallas window conv requires full z-extent columns"
    if len(win_cols) % gsize:
        gsize = 1
    n = kmap.shape[1]
    np_pad = -(-n // blk) * blk
    nb = np_pad // blk

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

    ncols = len(win_cols)
    if gsize == 1:
        cov = plan_cover(base, bits != 0, blk, win, clip_max=np_pad)
    else:
        # union cover per (group, block): interleave the group members'
        # bases within each block so plan_cover sees one [ng, nb, gs*blk]
        # base set; the same windows then serve every member column
        ng = ncols // gsize
        def regroup(x):
            return (x.reshape(ng, gsize, nb, blk).transpose(0, 2, 1, 3)
                    .reshape(ng, nb * gsize * blk))
        cov = plan_cover(regroup(base), regroup(bits != 0),
                         gsize * blk, win, clip_max=np_pad)
    cov.update(base=base, bits=bits, n_pad=np_pad,
               ncols=ncols, blk=blk, win=win, gsize=gsize)
    return cov


def plan_cover(base: jax.Array, hit: jax.Array, blk: int, win: int, *,
               clip_max: int, span: int = 0,
               nw: int | None = None, nwt: int | None = None,
               align: int = 8) -> dict:
    """Greedy aligned-window cover + flat per-block item list — the generic
    core shared by the conv plan (span=0: the w3 row at `base` already
    carries the base±1 slot contents) and the devoxelize plans (span=1:
    base AND base+1 must land in one window).

    base/hit [ncols, Np] (Np a blk multiple): per-column target rows.
    Window w starts (`align`-aligned) at the first base not covered by
    windows 0..w-1. A base COVERED by a window satisfies
    ``s <= base < s + win - span``; consecutive windows may overlap by up
    to `span` rows, but the covering window is unique (each window starts
    past the previous window's covered range), so an equality gather that
    honors the same `< win - span` bound matches each base exactly once.
    Parked (unused) window slots chain past the data and are clamped to
    ``clip_max`` so even a spurious prefetch DMA stays inside the staged
    [clip_max + win] rows.

    Returns dict(starts [ncols, nb, nw], wcnt [ncols, nb], overflow,
    it_off [nb*(ncols+1)], it_col / it_start [nb*nwt] — the flat
    column-major (column, window) item sequence the kernels iterate with
    one SMEM scalar read per item).
    """
    nw = NW if nw is None else nw
    nwt = NWT if nwt is None else nwt
    ncols, np_pad = base.shape
    assert np_pad % blk == 0
    nb = np_pad // blk
    big = jnp.int32(2 ** 30)
    bb = base.reshape(ncols, nb, blk)
    hb = hit.reshape(ncols, nb, blk)
    bbv = jnp.where(hb, bb, big)                          # miss -> +inf

    starts_l = []
    end = jnp.full(bbv.shape[:2], -1, jnp.int32)          # [ncols, nb]
    cnt = jnp.zeros(bbv.shape[:2], jnp.int32)
    for _w in range(nw):
        nxt = jnp.min(jnp.where(bbv > end[..., None], bbv, big), axis=2)
        has = nxt < big
        s = jnp.maximum((nxt // align) * align, 0)
        s = jnp.maximum(s, end + 1)                        # unique coverage
        s = jnp.where(has, s, end + 1 + win)               # park empties
        starts_l.append(s)
        end = s + win - 1 - span
        cnt = cnt + has.astype(jnp.int32)
    starts = jnp.stack(starts_l, axis=-1).astype(jnp.int32)  # [ncols,nb,nw]
    starts = jnp.clip(starts, 0, clip_max)

    def in_any(r):
        cov = jnp.zeros(r.shape, bool)
        for w in range(nw):
            s = starts[..., w][..., None]
            cov = cov | ((r >= s) & (r < s + win - span))
        return cov

    overflow = jnp.any(hb & ~in_any(bb))

    offs = jnp.concatenate(
        [jnp.zeros((1, nb), jnp.int32), jnp.cumsum(cnt, axis=0)], axis=0
    )                                                        # [ncols+1, nb]
    total = offs[-1]                                         # [nb]
    wi = jnp.arange(nw, dtype=jnp.int32)
    dest = jnp.where(wi[None, None, :] < cnt[..., None],
                     offs[:-1][..., None] + wi[None, None, :], nwt)
    dflat = dest.transpose(1, 0, 2).reshape(nb, ncols * nw)
    sflat = starts.transpose(1, 0, 2).reshape(nb, ncols * nw)
    cflat = jnp.broadcast_to(
        jnp.repeat(jnp.arange(ncols, dtype=jnp.int32), nw)[None],
        (nb, ncols * nw))
    _, it_start, it_col = jax.lax.sort(
        (dflat, sflat, cflat), num_keys=1, dimension=1)
    pad_it = max(nwt - ncols * nw, 0)
    if pad_it:
        it_start = jnp.pad(it_start, ((0, 0), (0, pad_it)))
        it_col = jnp.pad(it_col, ((0, 0), (0, pad_it)))
    it_start = it_start[:, :nwt]
    it_col = it_col[:, :nwt]
    overflow = overflow | jnp.any(total > nwt)
    it_off = jnp.minimum(offs.T, nwt).astype(jnp.int32)      # [nb, ncols+1]

    return dict(starts=starts, wcnt=cnt,
                it_off=it_off.reshape(-1), it_col=it_col.reshape(-1),
                it_start=it_start.reshape(-1), overflow=overflow)


# ---------------------------------------------------------------- kernels --


def _masked_slots(g, bits, c, cdt):
    """Apply the five window-column masks to the gathered [BLK, 3C] block.

    Masks are built as 2-D integer compares broadcast along lanes (bool ->
    bf16 casts of 1-D vectors and sub-128-lane VMEM writes both break
    Mosaic; 2-D compare + multiply is the production-proven pattern).
    Returns (gm, g0, gp) [BLK, C]: the z-1 / z / z+1 slot operands.
    """
    bits2 = bits[:, None]                                # [BLK, 1]
    a0 = ((bits2 & 1) > 0).astype(cdt)
    a1 = ((bits2 & 2) > 0).astype(cdt)
    b1 = ((bits2 & 4) > 0).astype(cdt)
    c1 = ((bits2 & 8) > 0).astype(cdt)
    c2 = ((bits2 & 16) > 0).astype(cdt)
    s0, s1, s2 = g[:, 0:c], g[:, c:2 * c], g[:, 2 * c:3 * c]
    return s0 * a0 + s1 * a1, s1 * b1, s1 * c1 + s2 * c2


def _pipeline_helpers(ngroups, b, itoff_ref, itst_ref, win_ref, sem, src_hbm,
                      win):
    """Shared flat-item machinery of the fwd/bwd kernels.

    Flat item sequence (column-major (column, window)) via the it_* SMEM
    arrays — one scalar read per item replaces the O(ncols) per-item
    next-start select chains of the round-3 v3 kernel. Window DMAs are
    prefetched NSLOT-deep: a (BLK, WIN) sweep showed per-item time nearly
    independent of the dot size — the bottleneck was the ~1-2 us HBM DMA
    latency of a 1-ahead prefetch, stalling every item's wait. The one-hot
    itself is deliberately built IMMEDIATELY before its dot in the loop
    body: an experiment that double-buffered it one item ahead (to overlap
    the VPU build with the MXU dot) measured 36% SLOWER — the
    cross-iteration scratch dependency forces a 512 KB VMEM round-trip per
    item that Mosaic otherwise elides by forwarding the fresh one-hot to
    the MXU.
    """
    total = itoff_ref[b * (ngroups + 1) + ngroups]

    def st(i):
        return pl.multiple_of(
            itst_ref[b * NWT + jnp.minimum(i, NWT - 1)], 8)

    def dma(slot, start):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(start, win), :], win_ref.at[slot],
            sem.at[slot])

    def warmup():
        # start the first NSLOT-1 items' DMAs (each predicated: an
        # unconsumed start on an all-padding block leaves its semaphore
        # signaled at kernel exit -> runtime fault / block corruption)
        for i0 in range(NSLOT - 1):
            @pl.when(i0 < total)
            def _():
                dma(i0 % NSLOT, st(i0)).start()

    return total, st, dma, warmup


def _fwd_kernel(ncols, gs, c, cout, nb, blk, win, itoff_ref, itcol_ref,
                itst_ref, base_ref, bits_ref,
                w3_hbm, w_ref, o_ref, acc_ref, oh_ref, win_ref, sem):
    """Grid (nb,): one BLK-row output block per step.

    it_off [nb*(ncols+1)] / it_col, it_start [nb*NWT] scalar-prefetch
    (SMEM; flat 1-D because Mosaic pads each SMEM operand's LAST dim to
    128 lanes — 2-D layouts inflate and overflow the 1 MB SMEM at
    batch >= 2); base/bits [ncols, BLK] VMEM blocks; w3_hbm [Np+WIN, 3C]
    stays in HBM — windows are DMA'd per item into the double-buffered
    win_ref [2, WIN, 3C]; w [ncols*3, C, cout] whole in VMEM.
    """
    b = pl.program_id(0)
    ng = ncols // gs
    acc_ref[:] = jnp.zeros_like(acc_ref)
    f32 = jnp.float32
    cdt = win_ref.dtype
    total, st, dma, warmup = _pipeline_helpers(
        ng, b, itoff_ref, itst_ref, win_ref, sem, w3_hbm, win)
    warmup()

    def grp_body(g, _unused):
        def body(i, _):
            slot = i % NSLOT

            @pl.when(i + NSLOT - 1 < total)
            def _():
                dma((i + NSLOT - 1) % NSLOT, st(i + NSLOT - 1)).start()

            dma(slot, st(i)).wait()
            iota = jax.lax.broadcasted_iota(jnp.int32, (blk, win), 1)
            for u in range(gs):
                j = g * gs + u
                loc = base_ref[j, :] - st(i)
                bits = bits_ref[j, :]
                oh_ref[:] = (iota == loc[:, None]).astype(cdt)
                g_blk = jnp.dot(oh_ref[:], win_ref[slot],
                                preferred_element_type=f32
                                ).astype(cdt)                # [blk, 3C]
                gm, g0, gp = _masked_slots(g_blk, bits, c, cdt)
                acc_ref[:] += jnp.dot(gm, w_ref[3 * j],
                                      preferred_element_type=f32)
                acc_ref[:] += jnp.dot(g0, w_ref[3 * j + 1],
                                      preferred_element_type=f32)
                acc_ref[:] += jnp.dot(gp, w_ref[3 * j + 2],
                                      preferred_element_type=f32)
            return 0

        lo = itoff_ref[b * (ng + 1) + g]
        hi = itoff_ref[b * (ng + 1) + g + 1]
        jax.lax.fori_loop(lo, hi, body, 0)
        return 0

    for g in range(ng):
        grp_body(g, 0)

    o_ref[:] = acc_ref[:]


def _run_fwd(w3_p, w_cols, plan):
    """w3_p [Np+win, 3C] bf16 in HBM, w_cols [ncols*3, C, cout] bf16."""
    np_pad = plan["n_pad"]
    ncols = plan["ncols"]
    blk, win = plan["blk"], plan["win"]
    gs = plan.get("gsize", 1)
    nb = np_pad // blk
    c = w_cols.shape[1]
    cout = w_cols.shape[-1]
    kern = partial(_fwd_kernel, ncols, gs, c, cout, nb, blk, win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # it_off, it_col, it_start -> SMEM
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ncols, blk), lambda b, o, cl, s: (0, b)),  # base
            pl.BlockSpec((ncols, blk), lambda b, o, cl, s: (0, b)),  # bits
            pl.BlockSpec(memory_space=pl.ANY),    # w3 stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights whole
        ],
        out_specs=pl.BlockSpec((blk, cout), lambda b, o, cl, s: (b, 0)),
        scratch_shapes=[pltpu.VMEM((blk, cout), jnp.float32),
                        pltpu.VMEM((blk, win), w3_p.dtype),
                        pltpu.VMEM((NSLOT, win, w3_p.shape[1]), w3_p.dtype),
                        pltpu.SemaphoreType.DMA((NSLOT,))],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_pad, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_for(ncols, c, cout, blk, win)),
        interpret=INTERPRET,
    )(plan["it_off"], plan["it_col"], plan["it_start"], plan["base"],
      plan["bits"], w3_p, w_cols)


def _bwd_kernel(ncols, gs, cin, cout, nb, blk, win, itoff_ref, itcol_ref,
                itst_ref, base_ref, bits_ref,
                w3d_hbm, wt_ref, featsb_ref, df_ref, dw_ref,
                acc_ref, oh_ref, win_ref, dwacc_ref, sem):
    """Fused backward, grid (nb,): per block, gather the dout w3 windows
    ONCE; the masked slots feed BOTH the dfeats accumulation (conv with
    flipped-transposed weights wt [ncols*3, cout, cin]) and the dW
    accumulation dwacc[3j+s] += feats_block^T @ slot_s (the transpose
    pairing of the forward, enumerated by input row). Round 2 ran two
    kernels and gathered dout twice. Same flat-item software pipeline as
    the forward (see _pipeline_helpers).
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    ng = ncols // gs
    f32 = jnp.float32
    cdt = win_ref.dtype
    fb = featsb_ref[:]                                   # [blk, cin]
    total, st, dma, warmup = _pipeline_helpers(
        ng, b, itoff_ref, itst_ref, win_ref, sem, w3d_hbm, win)
    warmup()

    def grp_body(g, _unused):
        def body(i, _):
            slot = i % NSLOT

            @pl.when(i + NSLOT - 1 < total)
            def _():
                dma((i + NSLOT - 1) % NSLOT, st(i + NSLOT - 1)).start()

            dma(slot, st(i)).wait()
            iota = jax.lax.broadcasted_iota(jnp.int32, (blk, win), 1)
            for u in range(gs):
                j = g * gs + u
                loc = base_ref[j, :] - st(i)
                bits = bits_ref[j, :]
                oh_ref[:] = (iota == loc[:, None]).astype(cdt)
                g_blk = jnp.dot(oh_ref[:], win_ref[slot],
                                preferred_element_type=f32).astype(cdt)
                gm, g0, gp = _masked_slots(g_blk, bits, cout, cdt)
                # dfeats: conv over dout with wt[j] = W[flip(row)]^T
                acc_ref[:] += jnp.dot(gm, wt_ref[3 * j],
                                      preferred_element_type=f32)
                acc_ref[:] += jnp.dot(g0, wt_ref[3 * j + 1],
                                      preferred_element_type=f32)
                acc_ref[:] += jnp.dot(gp, wt_ref[3 * j + 2],
                                      preferred_element_type=f32)
                # dW: slot-masked dout blocks against the feats block
                dims = (((0,), (0,)), ((), ()))
                dwacc_ref[3 * j] += jax.lax.dot_general(
                    fb, gm, dims, preferred_element_type=f32)
                dwacc_ref[3 * j + 1] += jax.lax.dot_general(
                    fb, g0, dims, preferred_element_type=f32)
                dwacc_ref[3 * j + 2] += jax.lax.dot_general(
                    fb, gp, dims, preferred_element_type=f32)
            return 0

        lo = itoff_ref[b * (ng + 1) + g]
        hi = itoff_ref[b * (ng + 1) + g + 1]
        jax.lax.fori_loop(lo, hi, body, 0)
        return 0

    for g in range(ng):
        grp_body(g, 0)

    df_ref[:] = acc_ref[:]

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dwacc_ref[:]


def _run_bwd(w3d_p, feats_p, wt_cols, plan, cin, cout):
    """w3d_p [Np+WIN, 3*cout] bf16 HBM (w3 of dout); feats_p [Np, cin]
    blocked; wt_cols [ncols*3, cout, cin]. Returns (dfeats, dw_cols)."""
    np_pad = plan["n_pad"]
    ncols = plan["ncols"]
    blk, win = plan["blk"], plan["win"]
    gs = plan.get("gsize", 1)
    nb = np_pad // blk
    kern = partial(_bwd_kernel, ncols, gs, cin, cout, nb, blk, win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ncols, blk), lambda b, o, cl, s: (0, b)),  # base
            pl.BlockSpec((ncols, blk), lambda b, o, cl, s: (0, b)),  # bits
            pl.BlockSpec(memory_space=pl.ANY),                # w3(dout)
            pl.BlockSpec(memory_space=pltpu.VMEM),               # wt whole
            pl.BlockSpec((blk, cin), lambda b, o, cl, s: (b, 0)),  # feats
        ],
        out_specs=(
            pl.BlockSpec((blk, cin), lambda b, o, cl, s: (b, 0)),  # dfeats
            pl.BlockSpec(memory_space=pltpu.VMEM),               # dW whole
        ),
        scratch_shapes=[pltpu.VMEM((blk, cin), jnp.float32),
                        pltpu.VMEM((blk, win), w3d_p.dtype),
                        pltpu.VMEM((NSLOT, win, w3d_p.shape[1]), w3d_p.dtype),
                        pltpu.VMEM((3 * ncols, cin, cout), jnp.float32),
                        pltpu.SemaphoreType.DMA((NSLOT,))],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((np_pad, cin), jnp.float32),
            jax.ShapeDtypeStruct((3 * ncols, cin, cout), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_for(ncols, cin, cout, blk, win)),
        interpret=INTERPRET,
    )(plan["it_off"], plan["it_col"], plan["it_start"], plan["base"],
      plan["bits"], w3d_p, wt_cols, feats_p)


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
    # bwd slot o holds dW[flip(order[o])]
    dest = flip[np.asarray(order)]
    inv = np.empty(k, np.int64)
    inv[dest] = np.arange(k)
    return dw_cols[jnp.asarray(inv)]


def _pad_rows(x, np_pad):
    n = x.shape[0]
    if n == np_pad:
        return x
    return jnp.pad(x, ((0, np_pad - n), (0, 0)))


def _w3_table(x: jax.Array) -> jax.Array:
    """w3[i] = [x[i-1], x[i], x[i+1]], [N, ceil(3C/128)*128]
    (sparse_conv._window_table + zero lane padding: the manual window DMA
    requires 128-aligned lane widths — Mosaic rejects memref slices whose
    lane extent is not a tiling multiple)."""
    zero = jnp.zeros((1, x.shape[1]), x.dtype)
    xm = jnp.concatenate([zero, x[:-1]], axis=0)
    xp = jnp.concatenate([x[1:], zero], axis=0)
    w3 = jnp.concatenate([xm, x, xp], axis=1)
    lanes = -(-w3.shape[1] // 128) * 128
    if lanes != w3.shape[1]:
        w3 = jnp.pad(w3, ((0, 0), (0, lanes - w3.shape[1])))
    return w3


def _stage_dtype(cdt):
    return jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32


def _strict() -> bool:
    """Cond-free mode: always run the pallas kernel; on plan overflow the
    output is NaN-poisoned instead of routed to the XLA fallback.

    Rationale: the per-conv ``lax.cond`` costs a TPU pipeline sync even when
    the taken branch is the kernel (profiled ~22 ms/step of `conditional.*`
    self-time at mk34 batch 1 — ~10% of the step, tpu_queue_r04e traces).
    Overflow needs a block whose monotone base-row cluster spans more than
    NW*WIN rows — never observed on real or ray-cast scans (p99 spread
    ~2.7k vs 8k coverage) — so production trades the dead branch for a loud
    failure: any overflow poisons the result with NaN (loss turns NaN the
    same step) rather than silently dropping contributions."""
    return _os.environ.get("OPENPCSEG_PALLAS_STRICT", "0") == "1"


def _poison(x, flag):
    """x + NaN where flag (scalar bool) is set — fuses into the epilogue."""
    return x + jnp.where(flag, jnp.float32(jnp.nan), jnp.float32(0.0)
                         ).astype(x.dtype)


def _fwd_or_fallback(feats, weights, kmap, offsets_key, cdt, plan):
    """lax.cond between the pallas kernel and the XLA window conv."""
    def pallas_branch(feats, weights):
        sdt = _stage_dtype(cdt)
        # stage win extra zero rows so the top window never over-runs
        fp = _pad_rows(feats.astype(sdt), plan["n_pad"] + plan["win"])
        w3 = _w3_table(fp)
        wc = _w_to_cols(weights, offsets_key, sdt)
        out = _run_fwd(w3, wc, plan)
        return out[: feats.shape[0]]

    def xla_branch(feats, weights):
        return _window_conv_impl(feats, weights, kmap, offsets_key, cdt)

    if _strict():
        return _poison(pallas_branch(feats, weights), plan["overflow"])
    return jax.lax.cond(
        plan["overflow"], xla_branch, pallas_branch, feats, weights)


def _plan_from_args(base, bits, it_off, it_col, it_start, overflow, sizes):
    return dict(base=base, bits=bits, it_off=it_off, it_col=it_col,
                it_start=it_start, overflow=overflow, n_pad=base.shape[1],
                ncols=base.shape[0], blk=sizes[0], win=sizes[1],
                gsize=sizes[2] if len(sizes) > 2 else 1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pallas_conv_core(feats, weights, offsets_key, compute_dtype, sizes,
                      kmap,
                      plan_base, plan_bits, plan_it_off, plan_it_col,
                      plan_it_start, plan_overflow):
    plan = _plan_from_args(plan_base, plan_bits, plan_it_off, plan_it_col,
                           plan_it_start, plan_overflow, sizes)
    return _fwd_or_fallback(feats, weights, kmap, offsets_key,
                            compute_dtype, plan)


def _core_fwd(feats, weights, offsets_key, compute_dtype, sizes, kmap,
              plan_base, plan_bits, plan_it_off, plan_it_col,
              plan_it_start, plan_overflow):
    out = _pallas_conv_core(feats, weights, offsets_key, compute_dtype,
                            sizes, kmap, plan_base, plan_bits, plan_it_off,
                            plan_it_col, plan_it_start, plan_overflow)
    return out, (feats, weights, kmap, plan_base, plan_bits, plan_it_off,
                 plan_it_col, plan_it_start, plan_overflow)


def _core_bwd(offsets_key, compute_dtype, sizes, res, dout):
    (feats, weights, kmap, plan_base, plan_bits, plan_it_off,
     plan_it_col, plan_it_start, plan_overflow) = res
    plan = _plan_from_args(plan_base, plan_bits, plan_it_off, plan_it_col,
                           plan_it_start, plan_overflow, sizes)
    k, cin, cout = weights.shape
    cdt = compute_dtype

    def pallas_branch(feats, weights, dout):
        sdt = _stage_dtype(cdt)
        dp = _pad_rows(dout.astype(sdt), plan["n_pad"] + plan["win"])
        w3d = _w3_table(dp)
        fp = _pad_rows(feats.astype(sdt), plan["n_pad"])
        wt = _w_to_cols_flipped(weights, offsets_key, sdt)
        dfeats, dw_cols = _run_bwd(w3d, fp, wt, plan, cin, cout)
        dw = _dw_unorder(dw_cols, offsets_key)
        return dfeats[: feats.shape[0]], dw

    def xla_branch(feats, weights, dout):
        from .sparse_conv import _window_bwd
        dfeats, dw, _ = _window_bwd(
            offsets_key, cdt, (feats, weights, kmap), dout)
        return dfeats.astype(jnp.float32), dw.astype(jnp.float32)

    if _strict():
        dfeats, dw = pallas_branch(feats, weights, dout)
        dfeats = _poison(dfeats, plan_overflow)
        dw = _poison(dw, plan_overflow)
    else:
        dfeats, dw = jax.lax.cond(
            plan_overflow, xla_branch, pallas_branch, feats, weights, dout)
    return (dfeats.astype(feats.dtype), dw.astype(weights.dtype), None,
            None, None, None, None, None, None)


_pallas_conv_core.defvjp(_core_fwd, _core_bwd)


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
    ncols = len(_COLUMN_PLANS[key][0])
    gsize = GSIZE if ncols % max(GSIZE, 1) == 0 else 1
    sizes = _size_policy(ncols, weights.shape[1], weights.shape[2]) + (gsize,)
    plan = build_window_plan(kmap, key, *sizes)
    out = _pallas_conv_core(
        feats, weights, key, compute_dtype, sizes, kmap,
        plan["base"], plan["bits"], plan["it_off"], plan["it_col"],
        plan["it_start"], plan["overflow"])
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))
