"""Geometry pass: build the voxel pyramid + all kernel maps for a forward.

This replaces the reference's lazy, cache-on-first-use kernel-map
construction inside every conv call (reference: torchsparse
nn/functional/conv.py:122-177, SparseTensor.cmaps/kmaps caches,
torchsparse/tensor.py:11-105) with one explicit precompute: coords at every
stride, submanifold/strided/transposed kernel maps, and point<->voxel
transfer tables. Features never enter here, so the whole pass is geometry
only and the conv network becomes pure gather+matmul.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops.coords import Keys, unique_coords, lookup_coords
from ..ops.kmap import (
    KernelSize,
    build_down_kmap,
    build_downsample,
    build_subm_kmap,
    build_up_kmap,
)
from ..ops.voxelize import (devox_transpose_bounds,
                            devoxelize_indices_weights)
from .tensor import DevoxTable, PointBuffer, SparseLevel, VoxelPyramid


def _stride3(stride) -> tuple:
    return (stride,) * 3 if isinstance(stride, int) else tuple(stride)


def _devox_scatterfree() -> bool:
    """Opt-in: scatter-free devoxelize transpose instead of scatter-add.

    Measured on v5e (bench.py, MinkUNet mk34): scatter-add backward 346
    ms/step vs XLA cumsum transpose 395 ms/step — the [8N, C] float32
    prefix sum's HBM traffic exceeds the scatter at the classifier's
    C>=96 devox levels, so scatter-add stays the default. On TPU the
    pallas window kernels (OPENPCSEG_DEVOX_PALLAS, ops/pallas_devox.py)
    supersede both; this flag only picks the XLA fallback flavor."""
    import os
    return os.environ.get("OPENPCSEG_DEVOX_SCATTERFREE", "0") == "1"


def _corner_table(lvl: SparseLevel) -> jax.Array:
    """[8, cap] neighbor indices at the {0,1}^3 corner offsets of every
    level voxel, ordered like ops.voxelize.corner_offsets (cx*4+cy*2+cz).

    Costs 3 z-run searches over cap queries: column (0,0) is the identity +
    self z-adjacency; columns (0,1)/(1,0)/(1,1) each yield their two
    z-corners from one lookup_keys_z3 search.
    """
    from ..ops.coords import lookup_keys_z3, make_keys
    from ..ops.kmap import _self_z_neighbors

    cap = lvl.coords.shape[0]
    rows = [None] * 8
    ident = jnp.where(lvl.valid, jnp.arange(cap, dtype=jnp.int32), -1)
    _, zp = _self_z_neighbors(lvl.keys, lvl.valid)
    rows[0] = ident   # (0,0,0)
    rows[1] = zp      # (0,0,1)
    cols = ((0, 1), (1, 0), (1, 1))
    offs = jnp.asarray([[cx, cy, 0] for cx, cy in cols], jnp.int32)
    q = jnp.concatenate(
        [jnp.broadcast_to(lvl.coords[None, :, :1], (3, cap, 1)),
         lvl.coords[None, :, 1:] + offs[:, None, :]], axis=-1)
    v = jnp.broadcast_to(lvl.valid[None, :], (3, cap))
    z3 = lookup_keys_z3(lvl.keys, make_keys(q, v))  # [3, 3, cap]
    for ci, (cx, cy) in enumerate(cols):
        rows[cx * 4 + cy * 2 + 0] = z3[1, ci]
        rows[cx * 4 + cy * 2 + 1] = z3[2, ci]
    return jnp.stack(rows, axis=0)


def _devox_weights(point_coords, point_valid, stride, idx) -> jax.Array:
    """Trilinear corner weights (same math as devoxelize_indices_weights)."""
    from ..ops.voxelize import corner_offsets

    p = point_coords / jnp.asarray(stride, point_coords.dtype)
    frac = p - jnp.floor(p)
    offs = corner_offsets().astype(point_coords.dtype)  # [8, 3]
    w = jnp.prod(
        jnp.where(offs[:, None, :] > 0, frac[None, :, :],
                  1.0 - frac[None, :, :]), axis=-1)
    return jnp.where((idx >= 0) & point_valid[None, :], w, 0.0)


def _updown_from_inverse(fine: SparseLevel, coarse: SparseLevel,
                         inverse: jax.Array, which: str) -> jax.Array:
    """k=2 stride-2 kernel maps for free from the downsample inverse map.

    For kernel 2 / stride 2, fine voxel i pairs with exactly one coarse
    voxel (its parent, ``inverse[i]``) at exactly one offset (the parity of
    its coordinates) — so the down map is ONE scatter and the up map is an
    elementwise select, replacing 16 x cap tree lookups per transition.
    Offset order matches kernel_offsets(2): index = px*4 + py*2 + pz.
    """
    parity = (fine.coords[:, 1:] & 1)
    off_idx = parity[:, 0] * 4 + parity[:, 1] * 2 + parity[:, 2]  # [cap_f]
    n_f = fine.coords.shape[0]
    ok = fine.valid & (inverse >= 0)
    if which == "up":
        # up_kmap[f][i] = parent index where parity matches
        offs = jnp.arange(8, dtype=off_idx.dtype)[:, None]
        return jnp.where(
            ok[None, :] & (off_idx[None, :] == offs), inverse[None, :], -1
        ).astype(jnp.int32)
    # down_kmap[f][o] = fine index i with parent o and parity f
    n_c = coarse.coords.shape[0]
    flat = jnp.where(ok, off_idx * n_c + inverse, 8 * n_c)
    out = jnp.full((8 * n_c + 1,), -1, jnp.int32).at[flat].set(
        jnp.arange(n_f, dtype=jnp.int32), mode="drop")
    return out[:8 * n_c].reshape(8, n_c)


def build_pyramid(
    coords0: jax.Array,                 # [n0, 4] int32 level-0 coords (b,x,y,z)
    valid0: jax.Array,                  # [n0] bool
    caps: Sequence[int],                # capacity per level (len = num levels)
    *,
    subm_kernel: Union[KernelSize, Sequence[Optional[KernelSize]]] = 3,
    updown_kernel: int = 2,
    down_factors: Optional[Sequence] = None,    # per-level downsample factor
                                                # from the previous level;
                                                # int or (fx, fy, fz). Default
                                                # 2 everywhere (MinkUNet);
                                                # Cylinder3D uses (2, 2, 1)
                                                # for its deep pools.
    point_coords: Optional[jax.Array] = None,   # [np, 3] float level-0 units
    point_batch: Optional[jax.Array] = None,    # [np]
    point_valid: Optional[jax.Array] = None,    # [np]
    devox_levels: Sequence[int] = (),
    p2v_levels: Sequence[int] = (),
    level0_keys: Optional[Keys] = None,
    point_to_voxel0: Optional[jax.Array] = None,  # precomputed point->level0
                                                  # index (e.g. the dedup
                                                  # inverse map) to skip the
                                                  # level-0 point lookup
    sort_block: Optional[int] = None,   # blocked nearly-sorted downsample
                                        # sort (ops.coords.sort_keys_blocked);
                                        # leave None on vmapped paths — see
                                        # build_downsample
) -> VoxelPyramid:
    """Build an L-level pyramid with all kernel maps.

    If `level0_keys` is given, `coords0` must already be the key-sorted
    deduplicated table with those keys (the output of ops.unique_coords /
    core.batch.voxelize_points_batch) — skips the level-0 re-sort.
    Otherwise coords0 is deduplicated here.
    """
    num_levels = len(caps)
    if subm_kernel is None or isinstance(subm_kernel, (int, tuple)):
        subm_kernels: list = [subm_kernel] * num_levels
    else:
        subm_kernels = list(subm_kernel)
    assert len(subm_kernels) == num_levels

    if down_factors is None:
        down_factors = [2] * num_levels
    factors = [
        (f, f, f) if isinstance(f, int) else tuple(f) for f in down_factors
    ]

    levels: list[SparseLevel] = []
    if level0_keys is not None:
        lvl = SparseLevel(coords=coords0, valid=valid0, keys=level0_keys,
                          stride=1)
    else:
        u0 = unique_coords(coords0, valid0, caps[0])
        lvl = SparseLevel(coords=u0.coords, valid=u0.valid, keys=u0.keys,
                          stride=1)
    levels.append(lvl)

    level_counts = [jnp.sum(levels[0].valid.astype(jnp.int32))]
    inverses = [None]  # fine-row -> coarse-row map per level transition
    for l in range(1, num_levels):
        prev = levels[l - 1]
        f = factors[l]
        down = build_downsample(prev.coords, prev.valid, caps[l], stride=f,
                                sort_block=sort_block)
        inverses.append(down.inverse)
        level_counts.append(down.num_unique)
        pstride = prev.stride if isinstance(prev.stride, tuple) else (
            (prev.stride,) * 3)
        levels.append(
            SparseLevel(
                coords=down.coords, valid=down.valid, keys=down.keys,
                stride=tuple(int(p * ff) for p, ff in zip(pstride, f)),
            )
        )

    # kernel maps (must come after all coords exist)
    for l in range(num_levels):
        lvl = levels[l]
        subm = (
            build_subm_kmap(lvl.keys, lvl.coords, lvl.valid, subm_kernels[l])
            if subm_kernels[l] is not None else None
        )
        down = (
            _updown_from_inverse(levels[l - 1], lvl, inverses[l], "down")
            if l >= 1 and updown_kernel == 2 and factors[l] == (2, 2, 2)
            else build_down_kmap(
                levels[l - 1].keys, True, lvl.coords, lvl.valid,
                kernel_size=updown_kernel, stride=factors[l],
            )
            if l >= 1 else None
        )
        up_parity = (l + 1 < num_levels and updown_kernel == 2
                     and factors[l + 1] == (2, 2, 2))
        up = (
            _updown_from_inverse(lvl, levels[l + 1], inverses[l + 1], "up")
            if up_parity
            else build_up_kmap(
                levels[l + 1].keys, lvl.coords, lvl.valid,
                kernel_size=updown_kernel, stride=factors[l + 1],
            )
            if l + 1 < num_levels else None
        )
        levels[l] = lvl.replace(subm_kmap=subm, down_kmap=down, up_kmap=up,
                                up_one_hot=up_parity)

    # point-side tables
    points_are_level0 = point_coords is None
    if point_coords is None:
        # the points ARE the level-0 voxel sites (voxel-modality default,
        # reference semantickitti_voxel.py pre-dedups on the host)
        point_coords = levels[0].coords[:, 1:].astype(jnp.float32)
        point_batch = levels[0].coords[:, 0]
        point_valid = levels[0].valid
        p2v0 = jnp.where(
            point_valid, jnp.arange(point_coords.shape[0], dtype=jnp.int32), -1
        )
    elif point_to_voxel0 is not None:
        p2v0 = point_to_voxel0
    else:
        cell = jnp.concatenate(
            [point_batch[:, None],
             jnp.floor(point_coords).astype(jnp.int32)], axis=1)
        p2v0 = lookup_coords(levels[0].keys, cell, point_valid)

    points = PointBuffer(coords=point_coords, batch=point_batch, valid=point_valid)

    # ancestor chain: level-0 row -> its voxel at level l, by composing the
    # downsample inverse maps (pure gathers, no lookups)
    ancestors: list = [None] * num_levels
    if points_are_level0 and devox_levels:
        anc = jnp.where(levels[0].valid,
                        jnp.arange(caps[0], dtype=jnp.int32), -1)
        ancestors[0] = anc
        for l in range(1, num_levels):
            nxt = inverses[l][jnp.maximum(anc, 0)]
            anc = jnp.where(anc >= 0, nxt, -1)
            ancestors[l] = anc

    devox: Dict[int, DevoxTable] = {}
    for l in devox_levels:
        if points_are_level0 and _stride3(levels[l].stride) == (1, 1, 1):
            # identity fast path: points == level-0 rows (see DevoxTable)
            dummy = jnp.zeros((8, 1), jnp.int32)
            devox[l] = DevoxTable(
                idx=dummy, weights=dummy.astype(jnp.float32), identity=True)
            continue
        if points_are_level0 and all(
                f == factors[1] == (2, 2, 2) for f in factors[1:l + 1]):
            # shared-corner fast path: every point in the same level-l cell
            # has the SAME 8 corner voxels, so search once per level-l voxel
            # (3 z-run columns x cap_l, ~14x fewer queries at deep levels)
            # and distribute through the ancestor chain.
            ct = _corner_table(levels[l])          # [8, cap_l]
            anc = ancestors[l]
            idx = jnp.where(anc[None, :] >= 0,
                            ct[:, jnp.maximum(anc, 0)], -1)
            w = _devox_weights(point_coords, point_valid,
                               _stride3(levels[l].stride), idx)
            if _devox_scatterfree():
                lo, hi = devox_transpose_bounds(idx, caps[l])
                devox[l] = DevoxTable(idx=idx, weights=w, lo=lo, hi=hi)
            else:
                devox[l] = DevoxTable(idx=idx, weights=w)
            continue
        idx, w = devoxelize_indices_weights(
            point_coords, point_batch, point_valid,
            levels[l].keys, stride=_stride3(levels[l].stride),
        )
        if points_are_level0 and _devox_scatterfree():
            # sorted level-0 points -> idx rows monotone -> the backward can
            # use the scatter-free prefix-sum transpose
            lo, hi = devox_transpose_bounds(idx, caps[l])
            devox[l] = DevoxTable(idx=idx, weights=w, lo=lo, hi=hi)
        else:
            devox[l] = DevoxTable(idx=idx, weights=w)

    p2v: Dict[int, jax.Array] = {}
    for l in p2v_levels:
        if l == 0:
            p2v[0] = p2v0
        else:
            sarr = jnp.asarray(_stride3(levels[l].stride))
            cell = jnp.concatenate(
                [point_batch[:, None],
                 (jnp.floor(point_coords).astype(jnp.int32) // sarr)],
                axis=1)
            p2v[l] = lookup_coords(levels[l].keys, cell, point_valid)

    return VoxelPyramid(
        levels=tuple(levels),
        points=points,
        point_to_voxel0=p2v0,
        devox=devox,
        p2v=p2v,
        level_counts=jnp.stack(level_counts),
    )


def _flatten_pyramid(pyr_b: VoxelPyramid, caps: Sequence[int]) -> VoxelPyramid:
    """Flatten a vmapped (per-scan) pyramid into the flat-table layout every
    model consumes: scan b's level-l rows occupy [b*caps[l], (b+1)*caps[l]);
    kernel-map entries get their scan's row offset (misses stay -1).
    level_counts stays [B, L] so overflow is judged per scan slice."""
    nb = pyr_b.levels[0].coords.shape[0]
    npts = pyr_b.points.coords.shape[1]
    num_levels = len(pyr_b.levels)

    def flat_rows(idx_b, target_l, row_count):
        """[B, K, n] per-scan indices into level target_l -> [K, B*n]."""
        if idx_b is None:
            return None
        off = (jnp.arange(nb, dtype=idx_b.dtype)
               * row_count(target_l))[:, None, None]
        g = jnp.where(idx_b >= 0, idx_b + off, -1)
        return jnp.swapaxes(g, 0, 1).reshape(g.shape[1], -1)

    def cap_of(l):
        return caps[l]

    levels = []
    for l, lvl in enumerate(pyr_b.levels):
        levels.append(SparseLevel(
            coords=lvl.coords.reshape(-1, 4),
            valid=lvl.valid.reshape(-1),
            keys=Keys(lvl.keys.hi.reshape(-1), lvl.keys.lo.reshape(-1)),
            stride=lvl.stride,
            subm_kmap=flat_rows(lvl.subm_kmap, l, cap_of),
            down_kmap=flat_rows(lvl.down_kmap, l - 1, cap_of),
            up_kmap=flat_rows(lvl.up_kmap, l + 1, cap_of),
            up_one_hot=lvl.up_one_hot,
        ))

    points = PointBuffer(
        coords=pyr_b.points.coords.reshape(-1, 3),
        batch=pyr_b.points.batch.reshape(-1),
        valid=pyr_b.points.valid.reshape(-1),
    )
    p2v0_b = pyr_b.point_to_voxel0                     # [B, n]
    off0 = (jnp.arange(nb, dtype=p2v0_b.dtype) * caps[0])[:, None]
    p2v0 = jnp.where(p2v0_b >= 0, p2v0_b + off0, -1).reshape(-1)

    devox = {}
    for l, tbl in pyr_b.devox.items():
        if tbl.identity:
            devox[l] = DevoxTable(idx=tbl.idx[0], weights=tbl.weights[0],
                                  identity=True)
            continue
        devox[l] = DevoxTable(
            idx=flat_rows(tbl.idx, l, cap_of),
            weights=jnp.swapaxes(tbl.weights, 0, 1).reshape(8, -1),
        )
    p2v = {}
    for l, idx_b in pyr_b.p2v.items():
        off = (jnp.arange(nb, dtype=idx_b.dtype) * caps[l])[:, None]
        p2v[l] = jnp.where(idx_b >= 0, idx_b + off, -1).reshape(-1)

    del npts, num_levels
    return VoxelPyramid(
        levels=tuple(levels), points=points, point_to_voxel0=p2v0,
        devox=devox, p2v=p2v, level_counts=pyr_b.level_counts,
    )


def build_pyramid_per_scan(
    coords0: jax.Array,                 # [B, cap0, 4] per-scan sorted tables
    valid0: jax.Array,                  # [B, cap0]
    caps: Sequence[int],                # PER-SCAN capacities
    *,
    subm_kernel: Union[KernelSize, Sequence[Optional[KernelSize]]] = 3,
    updown_kernel: int = 2,
    down_factors: Optional[Sequence] = None,
    point_coords: Optional[jax.Array] = None,   # [B, P, 3]
    point_batch: Optional[jax.Array] = None,    # [B, P]
    point_valid: Optional[jax.Array] = None,    # [B, P]
    devox_levels: Sequence[int] = (),
    p2v_levels: Sequence[int] = (),
    level0_keys: Optional[Keys] = None,         # Keys over [B, cap0]
    point_to_voxel0: Optional[jax.Array] = None,  # [B, P] LOCAL indices
) -> VoxelPyramid:
    """vmap :func:`build_pyramid` over scans, then flatten to the standard
    flat-table layout. Every sort / tree search / kernel map stays
    O(per-scan voxels) — see core/batch.py voxelize_points_per_scan for the
    measured batch>1 super-linear cost this removes."""
    assert level0_keys is not None, "per-scan pyramid needs level-0 keys"
    kw = dict(subm_kernel=subm_kernel, updown_kernel=updown_kernel,
              down_factors=down_factors, devox_levels=devox_levels,
              p2v_levels=p2v_levels)

    if point_coords is None:
        def one(c, v, kh, kl):
            return build_pyramid(c, v, caps, level0_keys=Keys(kh, kl), **kw)
        pyr_b = jax.vmap(one)(coords0, valid0,
                              level0_keys.hi, level0_keys.lo)
    else:
        def one(c, v, kh, kl, pc, pb, pv, p2v0):
            return build_pyramid(
                c, v, caps, point_coords=pc, point_batch=pb, point_valid=pv,
                level0_keys=Keys(kh, kl), point_to_voxel0=p2v0, **kw)
        pyr_b = jax.vmap(one)(
            coords0, valid0, level0_keys.hi, level0_keys.lo,
            point_coords, point_batch, point_valid, point_to_voxel0)
    return _flatten_pyramid(pyr_b, caps)
