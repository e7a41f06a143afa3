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
