"""Masked segment reductions over fixed-capacity padded buffers.

TPU replacements for the reference's scatter kernels:
- ``segment_sum/mean``  <- voxelize_forward_cuda (reference: torchsparse
  backend/voxelize/voxelize_cuda.cu:12-25, atomicAdd mean-scatter)
- ``segment_count``     <- count_cuda (reference: backend/others/count_cuda.cu)
- ``segment_max``       <- torch_scatter.scatter_max used by Cylinder3D
  (reference: tools/utils/common/seg_utils.py:176-180)

Convention: ``ids`` is int32 with -1 meaning "dropped" — those rows are
routed to an overflow slot and discarded, so XLA sees a plain static-shape
scatter (mode='drop' is not needed; we clamp to an extra slot).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _route(ids: jax.Array, num_segments: int) -> jax.Array:
    """Map -1 / out-of-range ids to the overflow slot `num_segments`."""
    bad = (ids < 0) | (ids >= num_segments)
    return jnp.where(bad, num_segments, ids)


def segment_sum(data: jax.Array, ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum rows of `data` [N, ...] into `num_segments` buckets by `ids` [N]."""
    routed = _route(ids, num_segments)
    out = jax.ops.segment_sum(data, routed, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(ids: jax.Array, num_segments: int) -> jax.Array:
    """Histogram of ids (reference count_cuda)."""
    ones = jnp.ones(ids.shape, jnp.int32)
    return segment_sum(ones, ids, num_segments)


def segment_mean(data: jax.Array, ids: jax.Array, num_segments: int):
    """Mean-scatter: returns (means, counts). Empty segments give 0."""
    s = segment_sum(data, ids, num_segments)
    cnt = segment_count(ids, num_segments)
    denom = jnp.maximum(cnt, 1).astype(data.dtype)
    return s / denom.reshape((-1,) + (1,) * (data.ndim - 1)), cnt


def segment_max(data: jax.Array, ids: jax.Array, num_segments: int) -> jax.Array:
    """Max-scatter; empty segments give 0 (matching scatter_max's zero init
    in the reference's voxelize, seg_utils.py:176-180 on non-negative relu'd
    features — we additionally clamp empties to 0 explicitly)."""
    routed = _route(ids, num_segments)
    out = jax.ops.segment_max(data, routed, num_segments=num_segments + 1)
    cnt = segment_count(ids, num_segments)
    out = out[:num_segments]
    empty = (cnt == 0).reshape((-1,) + (1,) * (data.ndim - 1))
    return jnp.where(empty, jnp.zeros_like(out), out)


def segment_min_index(ids: jax.Array, num_segments: int) -> jax.Array:
    """First-occurrence row index per segment (num rows where empty).

    Used to pick a deterministic representative point per voxel, matching
    the reference's `np.unique(..., return_index=True)` first-index pick
    (reference: torchsparse utils/quantize.py:25-46).
    """
    n = ids.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    routed = _route(ids, num_segments)
    out = jax.ops.segment_min(iota, routed, num_segments=num_segments + 1)
    return jnp.minimum(out[:num_segments], n)
