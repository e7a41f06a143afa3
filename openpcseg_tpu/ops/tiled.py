"""Dense-tile sparse convolution (prototype — the round-2 perf centerpiece).

Motivation: the gather-matmul sparse conv (ops/sparse_conv.py) is bound by
TPU row-gather throughput (~25-40 GB/s of 819 GB/s HBM). This module
restructures the computation so convs touch NO gathers at all:

1. Once per level per step, scatter the level's voxels into dense 4^3
   spatial tiles with a 1-cell halo (6^3 cells): `build_tiles`. Halo cells
   are filled by scattering each voxel into every neighboring tile whose
   extended grid contains it (boundary voxels land in up to 8 tiles).
2. A submanifold 3^3 conv then becomes STATIC SLICES of the [NT, 6, 6, 6, C]
   tile tensor + one big MXU matmul per offset (`tiled_subm_conv`) — dense
   math at ~10% occupancy costs ~6x the sparse FLOPs but runs at MXU speed
   instead of gather speed (projected >20x for level-0 convs).
3. Features can stay in tile form across consecutive convs of a stage;
   `tiles_to_voxels` / `voxels_to_tiles` convert at stage boundaries.

Equivalent in exact arithmetic to the gather formulation (tested vs
sparse_conv). Not yet wired into the models — integration and the
transposed/strided variants are round-2 work.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .coords import Keys, lookup_coords, unique_coords

TILE = 4            # tile edge (4^3 = 64 core cells)
EXT = TILE + 2      # extended edge with 1-cell halo
CELLS = EXT ** 3


class TileMap(NamedTuple):
    """Static-shape tile geometry for one level."""

    tile_coords: jax.Array   # [NT, 4] (b, tx, ty, tz) tile table (sorted)
    tile_valid: jax.Array    # [NT]
    voxel_cell: jax.Array    # [N] flat cell id of each voxel in ITS OWN tile
                             #     extended grid: tile*CELLS + local ext index
    halo_cells: jax.Array    # [26, N] flat ext-cell ids of this voxel in each
                             #     NEIGHBOR tile's grid (-1 when not in halo)
    num_tiles: jax.Array     # [] int32


def _ext_index(pos: jax.Array) -> jax.Array:
    """[..., 3] position in the extended grid (0..EXT-1) -> flat index."""
    return (pos[..., 0] * EXT + pos[..., 1]) * EXT + pos[..., 2]


def build_tiles(coords: jax.Array, valid: jax.Array, tile_cap: int) -> TileMap:
    """Assign voxels to 4^3 tiles; compute core + halo scatter targets.

    26 tile-table lookups per voxel — but built ONCE per level per step and
    amortized over every conv at that level (vs 8 tree searches per subm
    kernel map per conv in the gather formulation).
    """
    tc = jnp.concatenate([coords[:, :1], coords[:, 1:] // TILE], axis=1)
    uniq = unique_coords(tc, valid, tile_cap)

    local = coords[:, 1:] - (tc[:, 1:] * TILE)  # [N, 3] in [0, TILE)
    core_pos = local + 1                        # +1: halo shift
    voxel_cell = jnp.where(
        valid & (uniq.inverse >= 0),
        uniq.inverse * CELLS + _ext_index(core_pos), -1).astype(jnp.int32)

    # halo membership: voxel c sits in neighbor tile (tc + dt)'s extended
    # grid at position local - dt*TILE + 1 when that lies in [0, EXT)
    rows = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) == (0, 0, 0):
                    continue
                dt = jnp.asarray([dx, dy, dz], jnp.int32)
                pos = local - dt * TILE + 1
                inside = jnp.all((pos >= 0) & (pos < EXT), axis=1)
                ntc = jnp.concatenate(
                    [tc[:, :1], tc[:, 1:] + dt], axis=1)
                nt = lookup_coords(uniq.keys, ntc, valid & inside)
                cell = jnp.where(
                    (nt >= 0) & inside,
                    nt * CELLS + _ext_index(pos), -1).astype(jnp.int32)
                rows.append(cell)

    return TileMap(
        tile_coords=uniq.coords,
        tile_valid=uniq.valid,
        voxel_cell=voxel_cell,
        halo_cells=jnp.stack(rows, axis=0),
        num_tiles=uniq.num_unique,
    )


def voxels_to_tiles(feats: jax.Array, tm: TileMap, tile_cap: int) -> jax.Array:
    """Scatter [N, C] voxel features into [NT, EXT, EXT, EXT, C] dense tiles
    (core + halos). One scatter of 27N rows, amortized over a stage."""
    n, c = feats.shape
    total = tile_cap * CELLS
    targets = jnp.concatenate([tm.voxel_cell[None], tm.halo_cells], axis=0)
    flat_t = jnp.where(targets >= 0, targets, total).reshape(-1)
    src = jnp.broadcast_to(feats[None], (27, n, c)).reshape(-1, c)
    grid = jnp.zeros((total + 1, c), feats.dtype).at[flat_t].set(
        src, mode="drop")
    return grid[:total].reshape(tile_cap, EXT, EXT, EXT, c)


def tiles_to_voxels(grid: jax.Array, tm: TileMap) -> jax.Array:
    """Gather each voxel's own core cell back out of the tile tensor."""
    tile_cap = grid.shape[0]
    c = grid.shape[-1]
    flat = grid.reshape(tile_cap * CELLS, c)
    safe = jnp.maximum(tm.voxel_cell, 0)
    out = flat[safe]
    return jnp.where((tm.voxel_cell >= 0)[:, None], out, 0)


def tiled_subm_conv(
    grid: jax.Array,      # [NT, EXT, EXT, EXT, Cin] (halo-filled)
    weights: jax.Array,   # [27, Cin, Cout] in kernel_offsets(3) order
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """3^3 submanifold conv over dense tiles: static slices + MXU matmuls.

    Returns the CORE output grid [NT, TILE, TILE, TILE, Cout]. Occupancy
    masking is inherent: empty cells hold zero features, and outputs are
    read back only at real voxel cells (tiles_to_voxels).
    """
    nt = grid.shape[0]
    cin = grid.shape[-1]
    cout = weights.shape[-1]
    g = grid.astype(compute_dtype)
    w = weights.astype(compute_dtype)

    out = jnp.zeros((nt, TILE, TILE, TILE, cout), jnp.float32)
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                # neighbor at offset (dx,dy,dz) of core cell (i,j,l) lives at
                # extended position (i+1+dx, j+1+dy, l+1+dz): a static slice
                sl = g[:, 1 + dx:1 + dx + TILE,
                       1 + dy:1 + dy + TILE,
                       1 + dz:1 + dz + TILE, :]
                out = out + jax.lax.dot_general(
                    sl.reshape(nt * TILE ** 3, cin), w[k],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(nt, TILE, TILE, TILE, cout)
                k += 1
    return out


def tiled_subm_conv_voxels(
    feats: jax.Array, weights: jax.Array, tm: TileMap, tile_cap: int,
    out_valid: jax.Array, *, compute_dtype=jnp.float32,
) -> jax.Array:
    """Convenience wrapper: voxels -> tiles -> conv -> voxels (one conv).

    For real model stages, keep features in tile form across consecutive
    convs instead (halo refresh between convs = voxels_to_tiles again).
    """
    grid = voxels_to_tiles(feats, tm, tile_cap)
    core = tiled_subm_conv(grid, weights, compute_dtype=compute_dtype)
    # pad core back to extended layout for the uniform cell indexing
    ext = jnp.zeros(
        (tile_cap, EXT, EXT, EXT, core.shape[-1]), core.dtype
    ).at[:, 1:-1, 1:-1, 1:-1, :].set(core)
    out = tiles_to_voxels(ext, tm)
    out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(jnp.promote_types(feats.dtype, compute_dtype))
