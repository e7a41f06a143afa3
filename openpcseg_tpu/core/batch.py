"""Device-side batch voxelization: padded point scans -> sparse voxel batch.

TPU-native equivalent of the reference's host-side quantization + collate
(reference: pcseg/data/dataset/semantickitti/semantickitti_voxel.py:112-152 —
round(xyz/voxel_size), min-shift, sparse_quantize first-occurrence dedup,
sparse_collate_fn batch-index append). Here the host loader only loads,
augments and pads; quantize/dedup run inside jit on device so the CPU never
touches the 10^5-point unique (SURVEY.md §3.6 lists host-side
sparse_quantize as a top hot spot).

Semantics matched:
- voxel feature/label = those of the FIRST point (lowest index) in the voxel,
  exactly like np.unique's return_index used by sparse_quantize
  (reference: torchsparse utils/quantize.py:25-46);
- inverse_map maps every original point to its voxel for eval re-projection
  (reference: minkunet.py:436-455).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.coords import unique_coords
from ..ops.segment import segment_min_index, segment_sum


@struct.dataclass
class VoxelBatch:
    """One training/eval batch after device-side voxelization."""

    voxel_coords: jax.Array    # [V, 4] int32 (b,x,y,z) key-sorted; pad -1
    voxel_valid: jax.Array     # [V] bool
    voxel_keys_hi: jax.Array   # [V] int32 sorted key table (reusable by the
    voxel_keys_lo: jax.Array   # geometry pass -> no level-0 re-sort)
    voxel_feats: jax.Array     # [V, C] first-point features (pad rows 0)
    voxel_labels: jax.Array    # [V] int32 voxel labels (pad -1)
    inverse_map: jax.Array     # [B*Np] int32 point -> voxel row (-1 dropped)
    point_labels: jax.Array    # [B*Np] int32 original per-point labels
    point_valid: jax.Array     # [B*Np] bool
    point_batch: jax.Array     # [B*Np] int32 scan index of each point
    num_voxels: jax.Array      # [] int32 true voxel count (may exceed V)
    # per-scan true counts ([B]; set by the per-scan voxelizers, where each
    # scan owns a fixed cap slice and overflow is per slice)
    num_voxels_per_scan: jax.Array | None = None
    voxel_rep: jax.Array | None = None     # [V] int32 first-point row per
                                           # voxel (for gathering per-point
                                           # side data, e.g. RPVNet's pxpy)
    # point-input modalities only (Cylinder3D): per-point features + integer
    # grid coords (float) for the geometry pass; None for voxel modality
    point_feats: jax.Array | None = None   # [B*Np, C]
    point_grid: jax.Array | None = None    # [B*Np, 3] float level-0 units


def voxelize_points_batch(
    xyz: jax.Array,      # [B, Np, 3] float32 (augmented metric coords)
    feats: jax.Array,    # [B, Np, C] float32
    labels: jax.Array,   # [B, Np] int32
    valid: jax.Array,    # [B, Np] bool
    *,
    voxel_size: float,
    voxel_cap: int,
) -> VoxelBatch:
    """Quantize, min-shift per scan, dedup into a fixed-capacity voxel set."""
    b, n_pts, _ = xyz.shape
    grid = jnp.round(xyz / voxel_size).astype(jnp.int32)
    # per-scan min over valid points (reference pc_ -= pc_.min(0))
    big = jnp.iinfo(jnp.int32).max
    masked = jnp.where(valid[..., None], grid, big)
    mins = jnp.min(masked, axis=1, keepdims=True)  # [B, 1, 3]
    mins = jnp.where(mins == big, 0, mins)
    grid = grid - mins

    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, n_pts)
    )
    flat_coords = jnp.concatenate(
        [batch_idx.reshape(-1, 1), grid.reshape(-1, 3)], axis=1
    )
    flat_valid = valid.reshape(-1)
    flat_feats = feats.reshape(b * n_pts, -1)
    flat_labels = labels.reshape(-1)

    uniq = unique_coords(flat_coords, flat_valid, voxel_cap)

    rep = segment_min_index(uniq.inverse, voxel_cap)  # [V] first point per voxel
    rep_safe = jnp.minimum(rep, b * n_pts - 1)
    voxel_feats = jnp.where(
        uniq.valid[:, None], flat_feats[rep_safe], 0.0
    )
    voxel_labels = jnp.where(uniq.valid, flat_labels[rep_safe], -1)

    return VoxelBatch(
        voxel_coords=uniq.coords,
        voxel_valid=uniq.valid,
        voxel_keys_hi=uniq.keys.hi,
        voxel_keys_lo=uniq.keys.lo,
        voxel_feats=voxel_feats,
        voxel_labels=voxel_labels,
        inverse_map=uniq.inverse,
        point_labels=flat_labels,
        point_valid=flat_valid,
        point_batch=jnp.where(flat_valid, batch_idx.reshape(-1), -1),
        num_voxels=uniq.num_unique,
        voxel_rep=jnp.where(uniq.valid, rep_safe, -1),
    )


def voxelize_points_per_scan(
    xyz: jax.Array,      # [B, Np, 3]
    feats: jax.Array,    # [B, Np, C]
    labels: jax.Array,   # [B, Np]
    valid: jax.Array,    # [B, Np]
    *,
    voxel_size: float,
    voxel_cap: int,      # PER-SCAN capacity
) -> VoxelBatch:
    """Per-scan variant of :func:`voxelize_points_batch`: scan b dedups into
    its own [b*cap, (b+1)*cap) slice of the voxel table.

    Why: with one batch-summed table, every sort / tree search / padded
    buffer is O(total voxels) — lax.sort and the 16-ary lookup tree pay a
    log(total) factor per element, measured as a real ~8%/18% per-scan
    regression at batch 2/4 with IDENTICAL per-scan workload (BASELINE.md
    round-4 BENCH_DUP sweep). vmapping over scans keeps every table
    O(per-scan); the flat concatenation is still globally key-ordered
    *within each slice*, which is the only invariant the window convs and
    devox kernels need (padding keys between slices can't alias: they are
    INT32_MAX, and cross-slice z-adjacency is impossible because the batch
    index lives in the key high bits).
    """
    b, n_pts, _ = xyz.shape

    def one(xyz1, feats1, labels1, valid1, bidx):
        grid = jnp.round(xyz1 / voxel_size).astype(jnp.int32)
        big = jnp.iinfo(jnp.int32).max
        masked = jnp.where(valid1[:, None], grid, big)
        mins = jnp.min(masked, axis=0, keepdims=True)
        mins = jnp.where(mins == big, 0, mins)
        grid = grid - mins
        coords = jnp.concatenate(
            [jnp.full((n_pts, 1), 0, jnp.int32) + bidx, grid], axis=1)
        uniq = unique_coords(coords, valid1, voxel_cap)
        rep = segment_min_index(uniq.inverse, voxel_cap)
        rep_safe = jnp.minimum(rep, n_pts - 1)
        vfeats = jnp.where(uniq.valid[:, None], feats1[rep_safe], 0.0)
        vlabels = jnp.where(uniq.valid, labels1[rep_safe], -1)
        return (uniq.coords, uniq.valid, uniq.keys.hi, uniq.keys.lo,
                vfeats, vlabels, uniq.inverse, uniq.num_unique, rep_safe)

    bidx = jnp.arange(b, dtype=jnp.int32)
    (coords, vvalid, khi, klo, vfeats, vlabels, inverse, nuniq,
     rep) = jax.vmap(one)(xyz, feats, labels, valid, bidx)

    off_v = (bidx * voxel_cap)[:, None]
    off_p = (bidx * n_pts)[:, None]
    vvalid_flat = vvalid.reshape(-1)
    batch_idx = jnp.broadcast_to(bidx[:, None], (b, n_pts))
    flat_valid = valid.reshape(-1)
    return VoxelBatch(
        voxel_coords=coords.reshape(-1, 4),
        voxel_valid=vvalid_flat,
        voxel_keys_hi=khi.reshape(-1),
        voxel_keys_lo=klo.reshape(-1),
        voxel_feats=vfeats.reshape(b * voxel_cap, -1),
        voxel_labels=vlabels.reshape(-1),
        inverse_map=jnp.where(inverse >= 0, inverse + off_v, -1).reshape(-1),
        point_labels=labels.reshape(-1),
        point_valid=flat_valid,
        point_batch=jnp.where(flat_valid, batch_idx.reshape(-1), -1),
        num_voxels=jnp.sum(nuniq),
        num_voxels_per_scan=nuniq,
        voxel_rep=jnp.where(vvalid_flat, (rep + off_p).reshape(-1), -1),
    )


def cart2polar(xyz: jax.Array) -> jax.Array:
    """(rho, phi, z) cylindrical coords (reference
    semantickitti_cylinder.py:19-22)."""
    rho = jnp.sqrt(xyz[..., 0] ** 2 + xyz[..., 1] ** 2)
    phi = jnp.arctan2(xyz[..., 1], xyz[..., 0])
    return jnp.stack([rho, phi, xyz[..., 2]], axis=-1)


def cylinder_points_batch(
    xyz: jax.Array,       # [B, Np, 3] float32 (augmented metric coords)
    extra: jax.Array,     # [B, Np, E] remaining features (intensity[, ...])
    labels: jax.Array,    # [B, Np] int32
    valid: jax.Array,     # [B, Np] bool
    *,
    space_min,            # (rho, phi_deg, z) mins  (DATA.CYLINDER_SPACE_MIN)
    space_max,            # (DATA.CYLINDER_SPACE_MAX)
    grid_size,            # (DATA.CYLINDER_GRID_SIZE), e.g. (480, 360, 32)
    voxel_cap: int,
    num_class: int,
) -> VoxelBatch:
    """Device-side cylindrical partition for Cylinder3D.

    Reference semantics (pcseg/data/dataset/semantickitti/
    semantickitti_cylinder.py:144-175): cart->polar with phi in degrees,
    clip to the cylinder space, grid = floor((clip - min) / intervals) with
    intervals = range / (grid_size - 1); 9-dim point features
    [voxel-center rho/phi/z, rho/phi/z, x, y, intensity...]; per-voxel label
    by majority vote over point labels (voxelize_with_label :32-45).
    """
    b, n_pts, _ = xyz.shape
    mn = jnp.asarray(space_min, jnp.float32)
    mx = jnp.asarray(space_max, jnp.float32)
    gs = jnp.asarray(grid_size, jnp.float32)
    intervals = (mx - mn) / (gs - 1.0)

    pol = cart2polar(xyz)
    pol = pol.at[..., 1].multiply(180.0 / jnp.pi)  # degrees (reference :145)
    clipped = jnp.clip(pol, mn, mx)
    grid = jnp.floor((clipped - mn) / intervals).astype(jnp.int32)

    centers = (grid.astype(jnp.float32) + 0.5) * intervals + mn
    feats = jnp.concatenate([centers, pol, xyz[..., :2], extra], axis=-1)

    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, n_pts))
    flat_coords = jnp.concatenate(
        [batch_idx.reshape(-1, 1), grid.reshape(-1, 3)], axis=1)
    flat_valid = valid.reshape(-1)
    flat_feats = feats.reshape(b * n_pts, -1)
    flat_labels = labels.reshape(-1)

    uniq = unique_coords(flat_coords, flat_valid, voxel_cap)

    # majority label per voxel (ties -> lowest id, matching np.argmax)
    safe_lab = jnp.clip(flat_labels, 0, num_class - 1)
    onehot = jax.nn.one_hot(safe_lab, num_class, dtype=jnp.int32)
    onehot = onehot * flat_valid[:, None].astype(jnp.int32)
    counts = segment_sum(onehot, uniq.inverse, voxel_cap)  # [V, C]
    voxel_labels = jnp.where(uniq.valid, jnp.argmax(counts, axis=-1), -1)

    return VoxelBatch(
        voxel_coords=uniq.coords,
        voxel_valid=uniq.valid,
        voxel_keys_hi=uniq.keys.hi,
        voxel_keys_lo=uniq.keys.lo,
        voxel_feats=jnp.zeros((voxel_cap, 1), jnp.float32),  # model is
        # point-input: voxel features come from scatter-max of the point MLP
        voxel_labels=voxel_labels.astype(jnp.int32),
        inverse_map=uniq.inverse,
        point_labels=flat_labels,
        point_valid=flat_valid,
        point_batch=jnp.where(flat_valid, batch_idx.reshape(-1), -1),
        num_voxels=uniq.num_unique,
        point_feats=flat_feats,
        point_grid=grid.reshape(-1, 3).astype(jnp.float32),
    )


def cylinder_points_per_scan(
    xyz, extra, labels, valid, *,
    space_min, space_max, grid_size, voxel_cap: int, num_class: int,
) -> VoxelBatch:
    """Per-scan variant of :func:`cylinder_points_batch` (same rationale as
    :func:`voxelize_points_per_scan`: O(per-scan) tables)."""
    b, n_pts, _ = xyz.shape
    mn = jnp.asarray(space_min, jnp.float32)
    mx = jnp.asarray(space_max, jnp.float32)
    gs = jnp.asarray(grid_size, jnp.float32)
    intervals = (mx - mn) / (gs - 1.0)

    pol = cart2polar(xyz)
    pol = pol.at[..., 1].multiply(180.0 / jnp.pi)
    clipped = jnp.clip(pol, mn, mx)
    grid = jnp.floor((clipped - mn) / intervals).astype(jnp.int32)
    centers = (grid.astype(jnp.float32) + 0.5) * intervals + mn
    feats = jnp.concatenate([centers, pol, xyz[..., :2], extra], axis=-1)

    def one(grid1, labels1, valid1, bidx):
        coords = jnp.concatenate(
            [jnp.full((n_pts, 1), 0, jnp.int32) + bidx, grid1], axis=1)
        uniq = unique_coords(coords, valid1, voxel_cap)
        safe_lab = jnp.clip(labels1, 0, num_class - 1)
        onehot = jax.nn.one_hot(safe_lab, num_class, dtype=jnp.int32)
        onehot = onehot * valid1[:, None].astype(jnp.int32)
        counts = segment_sum(onehot, uniq.inverse, voxel_cap)
        vlabels = jnp.where(uniq.valid, jnp.argmax(counts, axis=-1), -1)
        return (uniq.coords, uniq.valid, uniq.keys.hi, uniq.keys.lo,
                vlabels.astype(jnp.int32), uniq.inverse, uniq.num_unique)

    bidx = jnp.arange(b, dtype=jnp.int32)
    (coords, vvalid, khi, klo, vlabels, inverse, nuniq) = jax.vmap(one)(
        grid, labels, valid, bidx)

    off_v = (bidx * voxel_cap)[:, None]
    batch_idx = jnp.broadcast_to(bidx[:, None], (b, n_pts))
    flat_valid = valid.reshape(-1)
    return VoxelBatch(
        voxel_coords=coords.reshape(-1, 4),
        voxel_valid=vvalid.reshape(-1),
        voxel_keys_hi=khi.reshape(-1),
        voxel_keys_lo=klo.reshape(-1),
        voxel_feats=jnp.zeros((b * voxel_cap, 1), jnp.float32),
        voxel_labels=vlabels.reshape(-1),
        inverse_map=jnp.where(inverse >= 0, inverse + off_v, -1).reshape(-1),
        point_labels=labels.reshape(-1),
        point_valid=flat_valid,
        point_batch=jnp.where(flat_valid, batch_idx.reshape(-1), -1),
        num_voxels=jnp.sum(nuniq),
        num_voxels_per_scan=nuniq,
        point_feats=feats.reshape(b * n_pts, -1),
        point_grid=grid.reshape(-1, 3).astype(jnp.float32),
    )
