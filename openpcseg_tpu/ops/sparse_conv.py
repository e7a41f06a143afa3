"""Sparse 3D convolution as gather -> MXU matmul, scatter-free in both passes.

TPU-native replacement for torchsparse's gather-GEMM-scatter conv
(reference: torchsparse backend/convolution/convolution_cuda.cu:14-80 and
nn/functional/conv.py:17-205; backward kernels convolution_backward_cuda).

Forward: the kernel map is dense ``idx[K, N_out]`` (at most one input per
output per kernel offset — a point query), so

    out[n] = sum_k  feats[kmap[k, n]] @ W[k]        (miss -> zero row)

is K row-gathers + K MXU matmuls, no scatter.

Backward (custom VJP): the data gradient of a sparse conv is itself a sparse
conv over the *transposed* kernel map —

    dfeats[i] = sum_k  dout[kmap_t[k, i]] @ W[k]^T

where ``kmap_t[k][i] = o  <=>  kmap[k][o] = i``. For submanifold (odd,
symmetric) kernels the transpose is just the offset-reversed map
``flip(kmap, 0)``; for strided/transposed convs it is the up/down map the
geometry pass already builds (core/geometry.py — their transpose duality is
asserted by tests/test_sparse_conv.py::test_down_then_up_kmap_are_transposes).
dW recomputes the forward gathers. Net effect: ZERO scatter ops anywhere in
the conv path — TPU scatters are far slower than row gathers — and no
gathered activation blocks stored between passes (the reference stores
fp16 gather buffers instead, conv.py:19-20).

The padded-lane invariant: rows of `feats` beyond the valid count are zero
and `kmap` never points at them, so no masking is needed beyond the final
out_valid multiply.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# scan unroll factor for the offset loop: amortizes XLA loop overhead while
# keeping at most _UNROLL gathered blocks live (full unroll makes XLA
# schedule all K gathers concurrently — measured 23G HBM OOM at 196k voxels)
_UNROLL = 4


def _gather_rows(x: jax.Array, idx_row: jax.Array, cdt) -> jax.Array:
    """Masked row gather: idx -1 -> zero row. [N] int32 -> [N, C]."""
    safe = jnp.maximum(idx_row, 0)
    g = x[safe].astype(cdt)
    return jnp.where((idx_row >= 0)[:, None], g, 0)


def _conv_apply(feats, weights, kmap, center: Optional[int], cdt):
    """out[n] = sum_k feats[kmap[k,n]] @ W[k].

    Accumulated with lax.scan over the offset axis so only ONE gathered
    [N, Cin] block is live at a time — with an unrolled loop XLA schedules
    all K gathers concurrently and blows HBM (measured: 23G for mk34 at
    196k voxels). The center offset (identity map) is computed outside the
    scan without a gather.
    """
    k, cin, cout = weights.shape
    n_out = kmap.shape[1]
    wc = weights.astype(cdt)
    fc = feats.astype(cdt)

    if center is not None:
        init = jnp.dot(fc, wc[center], preferred_element_type=jnp.float32)
        kmap_s = jnp.concatenate([kmap[:center], kmap[center + 1:]], axis=0)
        w_s = jnp.concatenate([wc[:center], wc[center + 1:]], axis=0)
    else:
        init = jnp.zeros((n_out, cout), jnp.float32)
        kmap_s, w_s = kmap, wc

    def body(acc, kw):
        idx_row, w = kw
        g = _gather_rows(feats, idx_row, cdt)
        return acc + jnp.dot(g, w, preferred_element_type=jnp.float32), None

    out, _ = jax.lax.scan(body, init, (kmap_s, w_s), unroll=_UNROLL)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sparse_conv_core(feats, weights, kmap, kmap_t, center, compute_dtype):
    return _conv_apply(feats, weights, kmap, center, compute_dtype)


def _core_fwd(feats, weights, kmap, kmap_t, center, compute_dtype):
    out = _conv_apply(feats, weights, kmap, center, compute_dtype)
    return out, (feats, weights, kmap, kmap_t)


def _core_bwd(center, compute_dtype, res, dout):
    feats, weights, kmap, kmap_t = res
    k, cin, cout = weights.shape
    cdt = compute_dtype
    dout_c = dout.astype(cdt)
    fc = feats.astype(cdt)

    # ONE gathered block per offset serves both gradients: with
    # g_t[k] = gather(dout, kmap_t[k]) (masked),
    #   dfeats += g_t[k] @ W[k]^T
    #   dW[k]   = feats^T @ g_t[k]
    # — the pair sums are identical whether enumerated by outputs (forward
    # map) or by inputs (transposed map), so no forward-gather recompute and
    # still zero scatters.
    w_t = jnp.swapaxes(weights.astype(cdt), 1, 2)  # [K, Cout, Cin]

    def body(acc, kw):
        idx_t_row, wt = kw
        g_t = _gather_rows(dout, idx_t_row, cdt)
        dacc = acc + jnp.dot(g_t, wt, preferred_element_type=jnp.float32)
        dw_k = jax.lax.dot_general(
            fc, g_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dacc, dw_k

    init = jnp.zeros((kmap_t.shape[1], cin), jnp.float32)
    if center is not None:
        init = init + jnp.dot(dout_c, w_t[center],
                              preferred_element_type=jnp.float32)
        dw_center = jax.lax.dot_general(
            fc, dout_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel = [i for i in range(k) if i != center]
        kmap_t_s = kmap_t[jnp.asarray(sel)]
        w_t_s = w_t[jnp.asarray(sel)]
    else:
        kmap_t_s, w_t_s = kmap_t, w_t

    dfeats, dws = jax.lax.scan(body, init, (kmap_t_s, w_t_s), unroll=_UNROLL)

    if center is not None:
        dws = jnp.concatenate(
            [dws[:center], dw_center[None], dws[center:]], axis=0)
    dw = dws.astype(weights.dtype)
    return dfeats.astype(feats.dtype), dw, None, None


_sparse_conv_core.defvjp(_core_fwd, _core_bwd)


def sparse_conv(
    feats: jax.Array,       # [N_in, Cin]  (padding rows zero)
    weights: jax.Array,     # [K, Cin, Cout]
    kmap: jax.Array,        # [K, N_out] int32, -1 = miss
    out_valid: jax.Array,   # [N_out] bool
    *,
    kmap_t: Optional[jax.Array] = None,  # [K, N_in] transposed map; None =>
                                         # offset-symmetric kernel: flip(kmap)
                                         # (requires N_in == N_out, i.e. subm)
    center: Optional[int] = None,        # offset index whose map is identity
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Returns out [N_out, Cout] float32."""
    if kmap_t is None:
        assert kmap.shape[1] == feats.shape[0], (
            "kmap_t required for non-submanifold conv (N_in != N_out)"
        )
        kmap_t = jnp.flip(kmap, axis=0)
    out = _sparse_conv_core(feats, weights, kmap, kmap_t, center, compute_dtype)
    out = jnp.where(out_valid[:, None], out, 0)
    # keep activations in the input dtype: with bf16 features the next
    # layer's gathers read half the HBM bytes (accumulation stays f32)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))


# --------------------------------------------------------------------------
# Window (z-column) submanifold conv — the round-2 fast path.
#
# Key structural fact: rows are sorted by packed (b,x,y,z) keys, so two
# voxels in the same (b,x,y) column with consecutive z ALWAYS occupy
# adjacent rows (nothing can sort between them). Hence for any kernel
# column (dx,dy) with z-offsets {-1,0,1}, all three matched input rows lie
# in {base-1, base, base+1} where base = first hit of (r0, rp, rm):
#   - r0 hit:  rm (if hit) == base-1 and rp (if hit) == base+1;
#   - r0 miss, rp hit: a z-gap at z means z-1 (if hit) sits DIRECTLY
#     before z+1, so rm == base-1;
#   - only rm hit: base = rm.
# So ONE row gather from the 3-row window table w3[i] = [f[i-1], f[i],
# f[i+1]] replaces three narrow gathers, with exact per-slot masks derived
# elementwise from the three kmap hit bits. Measured on v5e: TPU row
# gathers cost ~2 cycles/row nearly independent of width, so 8 window
# gathers beat 26 row gathers ~1.4-6x depending on channel width
# (tools/perf/w3v4_proto.py).
#
# The backward pass has the same shape: dfeats is a window conv over dout
# with offset-flipped columns (symmetric kernels: flip(kmap)), and each
# column's dW block comes from one [Cin, N] @ [N, 3*Cout] matmul against
# the already-gathered dout windows — zero scatters, no extra gathers.
# --------------------------------------------------------------------------


def _window_table(x: jax.Array) -> jax.Array:
    """w3[i] = [x[i-1], x[i], x[i+1]] raw (no masks), [N, 3C]."""
    zero = jnp.zeros((1, x.shape[1]), x.dtype)
    xm = jnp.concatenate([zero, x[:-1]], axis=0)
    xp = jnp.concatenate([x[1:], zero], axis=0)
    return jnp.concatenate([xm, x, xp], axis=1)


def _column_plan(offsets: np.ndarray):
    """Group kernel offsets by (dx, dy) column.

    Returns (win_cols, plain_rows): win_cols = list of (is_center,
    [k_minus, k_zero, k_plus]) for columns with full z-extent {-1,0,1};
    plain_rows = list of offset indices handled by plain row gathers.
    """
    cols: dict = {}
    for k, (dx, dy, dz) in enumerate(offsets):
        cols.setdefault((int(dx), int(dy)), {})[int(dz)] = k
    win, plain = [], []
    for (dx, dy), m in cols.items():
        if set(m.keys()) == {-1, 0, 1}:
            win.append(((dx, dy) == (0, 0), [m[-1], m[0], m[1]]))
        else:
            plain.extend(m.values())
    return win, plain


def _window_apply(feats, weights, kmap, win, plain, cdt,
                  want_blocks=False):
    """Shared fwd/bwd core of the window conv.

    Emits ONE matmul per conv: the masked window blocks of every column are
    laid out side by side as a [N, n_cols*3C (+plains)] im2col operand and
    contracted against the matching weight stack in a single dot. The 9
    small per-column dots of the first version were accumulator-bound (the
    f32 [N, Cout] accumulator round-trips HBM per dot — profiled at
    124 ms/step); the single dot reads each operand once.

    want_blocks=True additionally returns (gg_all, layout) where layout is
    [(offset_row, lane_start)] — the backward uses it to form every dW
    block from a single [Cin, total_lanes] dot.
    """
    n, c = feats.shape
    fc = feats.astype(cdt)
    wc = weights.astype(cdt)
    w3 = _window_table(fc)

    gg_parts = []
    w_parts = []
    layout = []
    lane = 0
    for is_center, rows in win:
        km, k0, kp = rows
        rm, r0, rp = kmap[km], kmap[k0], kmap[kp]
        hm, h0, hp = rm >= 0, r0 >= 0, rp >= 0
        if is_center:
            g = w3
            # base == identity; center slot needs no mask beyond validity,
            # which h0 encodes (identity row is -1 on invalid lanes)
            a0 = hm
            a1 = jnp.zeros_like(hm)
            b1 = h0
            c1 = jnp.zeros_like(hm)
            c2 = hp
        else:
            base = jnp.where(h0, r0, jnp.where(hp, rp, rm))
            g = w3[jnp.maximum(base, 0)]
            a0 = hm & (h0 | hp)
            a1 = hm & ~h0 & ~hp
            b1 = h0
            c1 = hp & ~h0
            c2 = hp & h0
        a0, a1, b1, c1, c2 = (
            m.astype(cdt)[:, None] for m in (a0, a1, b1, c1, c2))
        g0, g1, g2 = g[:, :c], g[:, c:2 * c], g[:, 2 * c:]
        gg = jnp.concatenate(
            [g0 * a0 + g1 * a1, g1 * b1, g1 * c1 + g2 * c2], axis=1)
        gg_parts.append(gg)
        w_parts.extend([wc[km], wc[k0], wc[kp]])
        for i, r in enumerate(rows):
            layout.append((r, lane + i * c))
        lane += 3 * c

    for k in plain:
        g = _gather_rows(feats, kmap[k], cdt)
        gg_parts.append(g)
        w_parts.append(wc[k])
        layout.append((k, lane))
        lane += c

    gg_all = jnp.concatenate(gg_parts, axis=1)
    w_all = jnp.concatenate(w_parts, axis=0)
    out = jnp.dot(gg_all, w_all, preferred_element_type=jnp.float32)
    if want_blocks:
        return out, gg_all, layout
    return out


def _win_flip_weights(weights, flip_perm):
    """weights reindexed to the offset-reversed order, transposed in/out."""
    return jnp.swapaxes(weights, 1, 2)[flip_perm]


def _window_conv_impl(feats, weights, kmap, offsets_key, compute_dtype):
    win, plain = _COLUMN_PLANS[offsets_key]
    return _window_apply(feats, weights, kmap, win, plain, compute_dtype)


# column plans are static per kernel shape; cached by a hashable key so the
# custom_vjp nondiff argument stays hashable
_COLUMN_PLANS: dict = {}


def _plan_key(offsets: np.ndarray):
    key = tuple(map(tuple, offsets.tolist()))
    if key not in _COLUMN_PLANS:
        _COLUMN_PLANS[key] = _column_plan(offsets)
    return key


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _window_conv_core(feats, weights, kmap, offsets_key, compute_dtype):
    return _window_conv_impl(feats, weights, kmap, offsets_key, compute_dtype)


def _window_fwd(feats, weights, kmap, offsets_key, compute_dtype):
    out = _window_conv_impl(feats, weights, kmap, offsets_key, compute_dtype)
    return out, (feats, weights, kmap)


def _window_bwd(offsets_key, compute_dtype, res, dout):
    feats, weights, kmap = res
    k, cin, cout = weights.shape
    cdt = compute_dtype
    fc = feats.astype(cdt)
    dout_c = dout.astype(cdt)

    # For odd symmetric kernels (offsets[k] == -offsets[K-1-k]), the data
    # gradient is a conv over the SAME kmap with reversed-transposed
    # weights: dfeats = sum_o gather(dout, kmap[o]) @ W[flip(o)]^T
    # (enumerate the fwd pairs by input row instead of output row). Keeping
    # the original kmap preserves the window column plan exactly. And
    # dW[flip(o)] = feats^T @ D_o where D_o is exactly the masked dout
    # block this pass already builds for offset row o — one extra matmul
    # per column, no extra gathers.
    flip = np.arange(k)[::-1].copy()
    w_t = _win_flip_weights(weights.astype(cdt), flip)  # w_t[j] = W[flip j]^T

    win, plain = _COLUMN_PLANS[offsets_key]
    dfeats, gg_all, layout = _window_apply(
        dout_c, w_t, kmap, win, plain, cdt, want_blocks=True)

    # every dW block from ONE [Cin, total_lanes] dot against the stacked
    # masked dout blocks: dW[flip(o)] = feats^T @ D_o
    dw_full = jax.lax.dot_general(
        fc, gg_all, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dws: dict = {}
    for r, lane in layout:
        dws[int(flip[r])] = dw_full[:, lane:lane + cout]

    dw = jnp.stack([dws[i] for i in range(k)], axis=0)
    return (dfeats.astype(feats.dtype), dw.astype(weights.dtype), None)


_window_conv_core.defvjp(_window_fwd, _window_bwd)


def window_subm_conv(
    feats: jax.Array,       # [N, Cin] sorted-by-key rows, padding zero
    weights: jax.Array,     # [K, Cin, Cout] in kernel_offsets order
    kmap: jax.Array,        # [K, N] submanifold kernel map (-1 miss)
    out_valid: jax.Array,   # [N]
    offsets: np.ndarray,    # [K, 3] the kernel offsets (host constant)
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Submanifold conv via z-window column gathers (fast path).

    Requires an odd offset-symmetric kernel (reversal == negation) and
    in-rows == out-rows. Exactly equivalent to :func:`sparse_conv`
    (oracle-tested); ~1.4-6x faster on v5e depending on channels.
    """
    assert kmap.shape[1] == feats.shape[0]
    out = _window_conv_core(feats, weights, kmap, _plan_key(offsets),
                            compute_dtype)
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))


# --------------------------------------------------------------------------
# k=2 / stride=2 transposed (up) conv fast path.
#
# With kernel 2 == stride 2 on every axis, each fine output voxel matches
# its unique parent at the single offset given by its coordinate parity
# (core/geometry.py _updown_from_inverse). The forward is then one matmul
# batch + ONE row gather instead of 8 masked gathers:
#     T[i, k] = feats[i] @ W[k]           (8 small MXU matmuls, fused)
#     out[f]  = T_flat[parent(f) * 8 + parity(f)]
# The backward keeps the gather-only transposed-map formulation of
# _core_bwd (the down map enumerates each parent's children exactly once).
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _up2_core(feats, weights, kmap, kmap_t, compute_dtype):
    return _up2_fwd_impl(feats, weights, kmap, compute_dtype)


def _up2_fwd_impl(feats, weights, kmap, cdt):
    k, cin, cout = weights.shape
    nc = feats.shape[0]
    fc = feats.astype(cdt)
    w_all = jnp.transpose(weights.astype(cdt), (1, 0, 2)).reshape(
        cin, k * cout)
    t = jnp.dot(fc, w_all, preferred_element_type=jnp.float32)  # [Nc, K*Cout]
    t_flat = t.reshape(nc * k, cout).astype(cdt)
    hit = kmap >= 0                                            # [K, Nf]
    idx = jnp.max(
        jnp.where(hit, kmap * k + jnp.arange(k, dtype=kmap.dtype)[:, None],
                  -1), axis=0)                                 # [Nf]
    g = t_flat[jnp.maximum(idx, 0)].astype(jnp.float32)
    return jnp.where((idx >= 0)[:, None], g, 0.0)


def _up2_fwd(feats, weights, kmap, kmap_t, compute_dtype):
    out = _up2_fwd_impl(feats, weights, kmap, compute_dtype)
    return out, (feats, weights, kmap_t)


def _up2_bwd(compute_dtype, res, dout):
    feats, weights, kmap_t = res
    k, cin, cout = weights.shape
    cdt = compute_dtype
    fc = feats.astype(cdt)
    w_t = jnp.swapaxes(weights.astype(cdt), 1, 2)

    def body(acc, kw):
        idx_t_row, wt = kw
        g_t = _gather_rows(dout, idx_t_row, cdt)
        dacc = acc + jnp.dot(g_t, wt, preferred_element_type=jnp.float32)
        dw_k = jax.lax.dot_general(
            fc, g_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dacc, dw_k

    init = jnp.zeros((kmap_t.shape[1], cin), jnp.float32)
    dfeats, dws = jax.lax.scan(body, init, (kmap_t, w_t), unroll=_UNROLL)
    return (dfeats.astype(feats.dtype), dws.astype(weights.dtype), None, None)


_up2_core.defvjp(_up2_fwd, _up2_bwd)


def sparse_conv_up2(
    feats: jax.Array,      # [N_coarse, Cin]
    weights: jax.Array,    # [8, Cin, Cout]
    kmap: jax.Array,       # [8, N_fine] up map: exactly one hit per output
    out_valid: jax.Array,  # [N_fine]
    kmap_t: jax.Array,     # [8, N_coarse] down map (for the backward)
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Transposed k2/s2 conv where each output has exactly one matched
    (input, offset) pair. Numerically identical to :func:`sparse_conv`."""
    out = _up2_core(feats, weights, kmap, kmap_t, compute_dtype)
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))


def sparse_conv_1x1(
    feats: jax.Array,      # [N, Cin]
    weights: jax.Array,    # [Cin, Cout] or [1, Cin, Cout]
    out_valid: jax.Array,  # [N]
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """1x1x1 sparse conv = plain per-voxel matmul (the reference's center-
    offset fast path, conv.py:53-80)."""
    w = weights if weights.ndim == 2 else weights[0]
    out = jnp.dot(
        feats.astype(compute_dtype), w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))
