"""Kernel-map construction for sparse convolution.

TPU-native replacement for torchsparse's kernel-map build
(reference: torchsparse nn/functional/conv.py:156-177 — spdownsample ->
sphash/kernel_hash -> sphashquery -> nbmaps/nbsizes).

Key structural difference from the reference: because a sparse-conv match is
a *point query* (for each output voxel and kernel offset there is at most one
input voxel), the kernel map here is a dense static-shape array
``idx[K, N_out]`` (-1 = miss) instead of the reference's variable-length
(nbmaps, nbsizes) pair lists. That keeps every downstream shape static for
XLA, and turns the conv into K gathers + K MXU matmuls with no scatter.

Coordinate conventions: each pyramid level stores coords in *its own grid
units* (i.e. already divided by the tensor stride). Downsampling by stride 2
is then uniformly ``floor(c / 2)`` and all kernel offsets are unit offsets,
regardless of depth (the reference instead keeps level-0 units and scales
offsets by the stride, get_kernel_offsets nn/utils/kernel.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .coords import Keys, lookup_coords, unique_coords, UniqueResult

KernelSize = Union[int, Sequence[int]]


def kernel_offsets(kernel_size: KernelSize) -> np.ndarray:
    """Integer offset grid for a (possibly anisotropic) kernel.

    Odd extents use centered offsets {-k//2..k//2}; even extents use
    {0..k-1} (torchsparse convention, nn/utils/kernel.py). Order is
    row-major over (x, y, z) — stable, documented, and irrelevant for
    training-from-scratch as long as weights follow the same order.
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * 3
    axes = []
    for k in kernel_size:
        if k % 2 == 1:
            axes.append(np.arange(-(k // 2), k // 2 + 1))
        else:
            axes.append(np.arange(0, k))
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    return np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1).astype(np.int32)  # [K,3]


def _query_offsets(
    table: Keys,
    coords: jax.Array,   # [N, 4] (b,x,y,z) of the *query side*
    valid: jax.Array,    # [N]
    offs: np.ndarray,    # [K, 3]
) -> jax.Array:
    """idx[K, N]: for each query coord + offset, its row in `table` (-1 miss)."""
    offs_j = jnp.asarray(offs)
    k, n = offs_j.shape[0], coords.shape[0]
    b = jnp.broadcast_to(coords[None, :, :1], (k, n, 1))
    xyz = coords[None, :, 1:] + offs_j[:, None, :]
    q = jnp.concatenate([b, xyz], axis=-1)
    v = jnp.broadcast_to(valid[None, :], (k, n))
    return lookup_coords(table, q, v)


def build_subm_kmap(
    level_keys: Keys,
    coords: jax.Array,
    valid: jax.Array,
    kernel_size: KernelSize = 3,
) -> jax.Array:
    """Submanifold (stride-1) kernel map: in and out coords are the same set.

    idx[K, N] into the same level's rows. The center offset always maps to
    the row itself (the reference special-cases this to skip gather/scatter,
    conv.py:53-80 — here XLA sees an identity gather it can simplify).
    """
    return _query_offsets(level_keys, coords, valid, kernel_offsets(kernel_size))


def build_downsample(
    coords: jax.Array,      # [N_in, 4] coords of the finer level (own units)
    valid: jax.Array,
    out_cap: int,
    stride: int = 2,
) -> UniqueResult:
    """Coords of the next level: unique(floor(c / stride)).

    Replaces spdownsample + unique (reference: torchsparse
    nn/functional/downsample.py:11-52).
    """
    down = jnp.concatenate([coords[:, :1], coords[:, 1:] // stride], axis=1)
    return unique_coords(down, valid, out_cap)


def build_down_kmap(
    fine_keys: Keys,
    fine_is_table: bool,
    coarse_coords: jax.Array,   # [N_out, 4] in coarse units
    coarse_valid: jax.Array,
    kernel_size: KernelSize = 2,
    stride: int = 2,
) -> jax.Array:
    """Kernel map for a strided (downsampling) conv, fine -> coarse.

    For coarse output voxel o, the matched fine input for offset f is the
    fine voxel at ``stride * o + f`` (offsets for even kernels are
    {0..k-1}). Returns idx[K, N_out] into the fine level's rows.
    """
    del fine_is_table
    offs = kernel_offsets(kernel_size)
    up_coords = jnp.concatenate(
        [coarse_coords[:, :1], coarse_coords[:, 1:] * stride], axis=1
    )
    return _query_offsets(fine_keys, up_coords, coarse_valid, offs)


def build_up_kmap(
    coarse_keys: Keys,
    fine_coords: jax.Array,   # [N_out, 4] fine-level coords (own units)
    fine_valid: jax.Array,
    kernel_size: KernelSize = 2,
    stride: int = 2,
) -> jax.Array:
    """Kernel map for a transposed (upsampling) conv, coarse -> fine.

    Transpose of :func:`build_down_kmap`: fine output c matches coarse input
    o for offset f iff ``c == stride * o + f``, i.e. ``(c - f)`` divisible by
    stride and ``(c - f) / stride`` present in the coarse table. For
    kernel 2 / stride 2 exactly one offset fires per output (the parity of
    c), so 7 of 8 rows are misses — XLA's masked gather makes these free-ish;
    a Pallas kernel can exploit it further.

    Returns idx[K, N_fine] into the coarse level's rows.
    """
    offs = kernel_offsets(kernel_size)
    offs_j = jnp.asarray(offs)
    k, n = offs_j.shape[0], fine_coords.shape[0]
    diff = fine_coords[None, :, 1:] - offs_j[:, None, :]   # [K, N, 3]
    divisible = jnp.all(diff % stride == 0, axis=-1)       # [K, N]
    q_xyz = diff // stride
    b = jnp.broadcast_to(fine_coords[None, :, :1], (k, n, 1))
    q = jnp.concatenate([b, q_xyz], axis=-1)
    v = jnp.broadcast_to(fine_valid[None, :], (k, n)) & divisible
    return lookup_coords(coarse_keys, q, v)
