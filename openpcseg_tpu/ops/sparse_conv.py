"""Sparse 3D convolution as gather -> MXU matmul (no scatter).

TPU-native replacement for torchsparse's gather-GEMM-scatter conv
(reference: torchsparse backend/convolution/convolution_cuda.cu:14-80 and
nn/functional/conv.py:17-205). The reference gathers matched input rows per
kernel offset, runs a cuBLAS GEMM over the matched pairs only, and
scatter-adds into outputs. On TPU we exploit the point-query structure of
sparse conv: the kernel map is a dense ``idx[K, N_out]`` (at most one input
per output per offset), so the conv is

    out[n] = sum_k  feats[idx[k, n]] @ W[k]        (miss -> zero row)

i.e. K gathers + one batched [K, N, Cin] x [K, Cin, Cout] MXU contraction.
All shapes are static; misses cost a masked select. Gradients flow through
JAX autodiff (gather transposes to scatter-add), replacing the reference's
hand-written convolution_backward_cuda.

The padded-lane invariant: rows of `feats` beyond the valid count are zero,
and `idx` never points at them (their coords are INVALID), so no output
masking is needed beyond multiplying by out_valid at the end.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sparse_conv(
    feats: jax.Array,       # [N_in, Cin]  (padding rows zero)
    weights: jax.Array,     # [K, Cin, Cout]
    kmap: jax.Array,        # [K, N_out] int32, -1 = miss
    out_valid: jax.Array,   # [N_out] bool
    *,
    compute_dtype=jnp.float32,
    mode: str = "batched",
) -> jax.Array:
    """Returns out [N_out, Cout] in `feats.dtype` promoted to float32 accum.

    mode='batched': one batched dot_general over the K axis (best MXU shape,
    peak memory K*N*Cin for the gathered block — wrap calls in
    jax.checkpoint to avoid storing it for backward).
    mode='loop': K accumulated matmuls (lower peak memory).
    """
    k, n_out = kmap.shape
    cin = feats.shape[1]
    safe = jnp.maximum(kmap, 0)
    hit = (kmap >= 0)[..., None]  # [K, N_out, 1]

    fc = feats.astype(compute_dtype)
    wc = weights.astype(compute_dtype)

    if mode == "batched":
        g = jnp.where(hit, fc[safe], 0)  # [K, N_out, Cin]
        out = jax.lax.dot_general(
            g, wc,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [K, N_out, Cout]
        out = jnp.sum(out, axis=0)
    elif mode == "loop":
        out = None
        for kk in range(k):
            g = jnp.where(hit[kk], fc[safe[kk]], 0)  # [N_out, Cin]
            part = jnp.dot(g, wc[kk], preferred_element_type=jnp.float32)
            out = part if out is None else out + part
    else:
        raise ValueError(f"unknown sparse_conv mode {mode!r}")

    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, jnp.float32))


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
    return out.astype(jnp.promote_types(feats.dtype, jnp.float32))
