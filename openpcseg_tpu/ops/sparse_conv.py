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

from functools import partial

import jax
import jax.numpy as jnp


def _conv_core(feats, weights, kmap, mode: str, compute_dtype):
    k, _ = kmap.shape
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
        return jnp.sum(out, axis=0)
    elif mode == "loop":
        out = None
        for kk in range(k):
            g = jnp.where(hit[kk], fc[safe[kk]], 0)  # [N_out, Cin]
            part = jnp.dot(g, wc[kk], preferred_element_type=jnp.float32)
            out = part if out is None else out + part
        return out
    raise ValueError(f"unknown sparse_conv mode {mode!r}")


def sparse_conv(
    feats: jax.Array,       # [N_in, Cin]  (padding rows zero)
    weights: jax.Array,     # [K, Cin, Cout]
    kmap: jax.Array,        # [K, N_out] int32, -1 = miss
    out_valid: jax.Array,   # [N_out] bool
    *,
    compute_dtype=jnp.float32,
    mode: str = "loop",
    remat: bool = True,
) -> jax.Array:
    """Returns out [N_out, Cout] in `feats.dtype` promoted to float32 accum.

    mode='loop' (default): K accumulated matmuls — measured ~8x faster than
    'batched' on TPU v5e (19ms vs 164ms fwd at [27, 196k, 32]): per-offset
    1D-index row gathers fuse into the matmuls, while the batched form
    materializes the [K, N, Cin] block through a slow 2D-index gather.
    mode='batched': one batched dot_general over the K axis.

    remat=True rematerializes the gathered [K, N_out, Cin] block in the
    backward pass instead of storing it (it would otherwise dominate
    activation memory — K x the feature map per conv). This replaces the
    reference's AMP memory strategy (fp16 gather buffers,
    torchsparse conv.py:19-20) with recomputation, which on TPU costs one
    extra HBM gather pass per conv.
    """
    core = partial(_conv_core, mode=mode, compute_dtype=compute_dtype)
    if remat:
        core = jax.checkpoint(core)
    out = core(feats, weights, kmap)
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
