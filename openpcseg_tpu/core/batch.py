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
