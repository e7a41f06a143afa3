"""Point <-> voxel transfer ops (mean-voxelize, trilinear devoxelize).

TPU-native equivalents of the reference CUDA ops:
- ``voxelize_mean``       <- spvoxelize / voxelize_forward_cuda
  (reference: torchsparse backend/voxelize/voxelize_cuda.cu:12-25,
  python wrapper nn/functional/voxelize.py:11-56)
- ``devoxelize_trilinear``<- spdevoxelize / devoxelize_forward_cuda +
  calc_ti_weights (reference: backend/devoxelize/devoxelize_cuda.cu:11-33,
  nn/functional/devoxelize.py:12-103)

Both are differentiable through JAX autodiff (gather/scatter transpose),
replacing the reference's hand-written backward kernels.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .coords import Keys, lookup_coords
from .segment import segment_mean


def voxelize_mean(point_feats: jax.Array, idx: jax.Array, num_voxels: int) -> jax.Array:
    """Average point features into their voxel (idx -1 = dropped point).

    Matches spvoxelize semantics: out[v] = mean over points with idx==v
    (reference voxelize_cuda.cu:12-25 computes sum then divides by count).
    """
    out, _ = segment_mean(point_feats, idx, num_voxels)
    return out


def corner_offsets() -> jax.Array:
    """The 8 unit-cube corners, ordering matches bit pattern (x,y,z)."""
    offs = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                offs.append((dx, dy, dz))
    return jnp.asarray(offs, jnp.int32)  # [8, 3]


def devoxelize_indices_weights(
    point_coords: jax.Array,   # [N, 3] float32 point coords in *level-0 grid units*
    point_batch: jax.Array,    # [N] int32 batch index
    point_valid: jax.Array,    # [N] bool
    voxel_keys: Keys,          # sorted key table of the voxel level
    stride,                    # int or (sx, sy, sz)
) -> Tuple[jax.Array, jax.Array]:
    """Per-point 8-corner voxel indices + trilinear weights at a stride.

    Reference semantics (minkunet/utils.py:69-96): corners are
    floor(p/stride) + {0,1}^3 on the stride grid; weight per corner is the
    trilinear product; missing corners contribute nothing (no
    renormalization), matching calc_ti_weights + spdevoxelize with idx -1.

    Returns (idx [8, N] int32 with -1 miss, weights [8, N] float32).
    """
    if isinstance(stride, int):
        stride = (stride,) * 3
    p = point_coords / jnp.asarray(stride, point_coords.dtype)
    base = jnp.floor(p)
    frac = p - base  # in [0, 1)
    base = base.astype(jnp.int32)

    offs = corner_offsets()  # [8, 3]
    n = point_coords.shape[0]
    # one tree search per (cx, cy) column; the z=0 / z=1 corners come from
    # the same search (packed keys are z-consecutive) -> 4 searches not 8
    from .coords import lookup_keys_z3, make_keys
    idx_rows = [None] * 8
    for ci, (cx, cy) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        q = jnp.concatenate(
            [point_batch[:, None],
             base + jnp.asarray([cx, cy, 0], jnp.int32)], axis=1)
        z3 = lookup_keys_z3(voxel_keys, make_keys(q, point_valid))
        # corner order in corner_offsets(): index = cx*4 + cy*2 + cz
        idx_rows[cx * 4 + cy * 2 + 0] = z3[1]
        idx_rows[cx * 4 + cy * 2 + 1] = z3[2]
    idx = jnp.stack(idx_rows, axis=0)  # [8, N]
    valid8 = jnp.broadcast_to(point_valid[None, :], (8, n))

    # trilinear weight: prod over axes of (off ? frac : 1-frac)
    offf = offs.astype(point_coords.dtype)  # [8, 3]
    w = jnp.prod(
        jnp.where(offf[:, None, :] > 0, frac[None, :, :], 1.0 - frac[None, :, :]),
        axis=-1,
    )  # [8, N]
    w = jnp.where((idx >= 0) & valid8, w, 0.0)
    return idx, w


def _devox_apply(voxel_feats, idx, weights):
    safe = jnp.maximum(idx, 0)
    out = None
    for k in range(8):
        g = voxel_feats[safe[k]]  # [N, C]
        contrib = g * weights[k][:, None].astype(voxel_feats.dtype)
        out = contrib if out is None else out + contrib
    return out


def devox_transpose_bounds(idx: jax.Array, num_voxels: int):
    """Per-(corner, voxel) first/last contributor rows for the scatter-free
    devoxelize backward.

    Point rows are sorted by packed keys and each corner's voxel key is the
    point key plus a constant offset, so idx[k] is MONOTONE over hit points
    — every voxel's contributors per corner form one contiguous row run
    (miss rows inside a run carry zero weight). Returns (lo, hi) [8, V]
    int32; empty -> lo = N, hi = -1.
    """
    from .segment import _route

    k8, n = idx.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (k8, n))
    # one segment op over 8*(V+1) buckets: corner k voxel v -> k*(V+1)+v
    seg = (_route(idx, num_voxels)
           + jnp.arange(k8, dtype=jnp.int32)[:, None] * (num_voxels + 1))
    lo = jax.ops.segment_min(iota.reshape(-1), seg.reshape(-1),
                             num_segments=k8 * (num_voxels + 1))
    hi = jax.ops.segment_max(iota.reshape(-1), seg.reshape(-1),
                             num_segments=k8 * (num_voxels + 1))
    lo = jnp.minimum(lo, n).reshape(k8, num_voxels + 1)[:, :num_voxels]
    hi = jnp.maximum(hi, -1).reshape(k8, num_voxels + 1)[:, :num_voxels]
    return lo, hi


@jax.custom_vjp
def _devox_core(voxel_feats, idx, weights, lo, hi):
    return _devox_apply(voxel_feats, idx, weights)


def _devox_fwd(voxel_feats, idx, weights, lo, hi):
    proto = jnp.zeros((), voxel_feats.dtype)  # dtype carrier (a leaf)
    return _devox_apply(voxel_feats, idx, weights), (
        idx, weights, lo, hi, proto)


def _devox_bwd(res, dout):
    """Scatter-free transpose: dvox[v] += sum over the contiguous run of
    contributors — a prefix sum of dout*w gathered at the run bounds
    (replaces autodiff's 8 scatter-adds, profiled at 20 ms/step)."""
    idx, weights, lo, hi, proto = res
    v = lo.shape[1]
    k8, n = idx.shape
    c = dout.shape[1]
    d32 = dout.astype(jnp.float32)
    # zs[k*N + p] = dout[p] * w[k, p]  (weights are zero on misses)
    zs = (d32[None, :, :] * weights[:, :, None].astype(jnp.float32)
          ).reshape(k8 * n, c)
    csz = jnp.concatenate(
        [jnp.zeros((1, c), jnp.float32), jnp.cumsum(zs, axis=0)], axis=0)
    offs = (jnp.arange(k8, dtype=jnp.int32) * n)[:, None]
    top = csz[(jnp.minimum(hi, n - 1) + offs + 1).reshape(-1)]
    bot = csz[(jnp.maximum(lo, 0) + offs).reshape(-1)]
    dvox = (top - bot).reshape(k8, v, c)
    dvox = jnp.where((hi >= 0)[..., None], dvox, 0.0).sum(axis=0)
    return (dvox.astype(proto.dtype), None, None, None, None)


_devox_core.defvjp(_devox_fwd, _devox_bwd)


def devoxelize_trilinear(
    voxel_feats: jax.Array,  # [V, C]
    idx: jax.Array,          # [8, N] int32, -1 = miss
    weights: jax.Array,      # [8, N]
    lo: jax.Array = None,    # [8, V] transpose run bounds (see
    hi: jax.Array = None,    # devox_transpose_bounds); None -> autodiff bwd
) -> jax.Array:
    """Gather-interpolate voxel features to points (reference
    devoxelize_cuda.cu:11-33). Returns [N, C].

    On TPU (OPENPCSEG_DEVOX_PALLAS=auto/1) both directions run the window
    one-hot MXU kernels (ops/pallas_devox.py) — requires key-sorted point
    rows, which every production caller (core/geometry.py) guarantees; the
    kernel's overflow cond falls back to this XLA path otherwise. With
    (lo, hi) bounds the backward is the scatter-free prefix-sum transpose;
    plain autodiff (8 scatter-adds) otherwise."""
    from .pallas_devox import pallas_devoxelize, use_pallas_devox
    if use_pallas_devox():
        return pallas_devoxelize(voxel_feats, idx, weights)
    if lo is not None and hi is not None:
        return _devox_core(voxel_feats, idx, weights, lo, hi)
    return _devox_apply(voxel_feats, idx, weights)


def voxel_to_point_nearest(
    voxel_feats: jax.Array,
    idx0: jax.Array,  # [N] index of the containing voxel (corner 0), -1 = miss
) -> jax.Array:
    """Nearest-voxel devoxelize (reference voxel_to_point(nearest=True),
    minkunet/utils.py:83-85: zero out all but corner 0)."""
    safe = jnp.maximum(idx0, 0)
    g = voxel_feats[safe]
    return jnp.where((idx0 >= 0)[:, None], g, 0.0)
