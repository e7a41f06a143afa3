"""Sparse tensor pytrees: fixed-capacity padded voxel levels and point buffers.

TPU-native replacement for torchsparse's dynamic-shape ``SparseTensor`` /
``PointTensor`` (reference: torchsparse/tensor.py:11-105). Instead of
variable-length coordinate/feature tensors plus mutable cmaps/kmaps caches,
we carry static-capacity arrays with validity masks, and make the coordinate
caches explicit: a :class:`VoxelPyramid` holds every level's coords and every
kernel map the network will need, built once per step as a pure function of
the input coords (see core/geometry.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
from flax import struct

from ..ops.coords import Keys


@struct.dataclass
class SparseLevel:
    """One resolution level of the voxel pyramid.

    coords are in the level's own grid units (already divided by the tensor
    stride — the reference keeps level-0 units and scales offsets instead,
    torchsparse nn/utils/kernel.py).
    """

    coords: jax.Array           # [cap, 4] int32 (b, x, y, z); padding -1
    valid: jax.Array            # [cap] bool
    keys: Keys                  # sorted 2-int32 key table (lookup-ready)
    # tensor stride relative to level 0: int (isotropic) or (sx, sy, sz)
    stride: int | tuple = struct.field(pytree_node=False)
    # kernel maps (None if the model doesn't need them at this level):
    subm_kmap: Optional[jax.Array] = None   # [K, cap] into this level
    down_kmap: Optional[jax.Array] = None   # [K, cap] into the previous
                                            # (finer) level: strided conv map
    up_kmap: Optional[jax.Array] = None     # [K, cap] into the next
                                            # (coarser) level: transposed map
    # True when up_kmap came from the k2/s2 parity construction
    # (_updown_from_inverse): exactly one offset fires per output, enabling
    # the one-gather transposed-conv fast path (ops.sparse_conv_up2)
    up_one_hot: bool = struct.field(pytree_node=False, default=False)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


@struct.dataclass
class PointBuffer:
    """Flattened padded point set (the model-facing 'points' — which for the
    voxel pipelines are the deduplicated level-0 sites, matching the
    reference where the dataset pre-dedups with sparse_quantize,
    semantickitti_voxel.py:115-120)."""

    coords: jax.Array   # [n, 3] float32 coords in level-0 grid units
    batch: jax.Array    # [n] int32 batch index (-1 padding)
    valid: jax.Array    # [n] bool

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


@struct.dataclass
class DevoxTable:
    """Precomputed 8-corner devoxelize indices/weights at one level
    (the reference caches these in PointTensor.idx_query/weights,
    minkunet/utils.py:69-105).

    identity=True marks the voxel-modality fast path at stride 1: the points
    ARE the level-0 rows, so devoxelize is a no-op (the reference computes
    degenerate trilinear weights there; we skip the 8 lookups + gathers).
    """

    idx: jax.Array      # [8, n] int32 into the level's rows (-1 miss)
    weights: jax.Array  # [8, n] float32
    # transpose run bounds (ops.voxelize.devox_transpose_bounds) for the
    # scatter-free backward; only valid when the points are the sorted
    # level-0 sites (idx rows monotone) — None falls back to autodiff
    lo: Optional[jax.Array] = None   # [8, V]
    hi: Optional[jax.Array] = None   # [8, V]
    identity: bool = struct.field(pytree_node=False, default=False)

    def apply(self, voxel_feats: jax.Array) -> jax.Array:
        if self.identity:
            return voxel_feats
        from ..ops.voxelize import devoxelize_trilinear
        return devoxelize_trilinear(voxel_feats, self.idx, self.weights,
                                    lo=self.lo, hi=self.hi)


@struct.dataclass
class VoxelPyramid:
    """All level geometry + kernel maps for one network forward.

    Built once per step from input coords only (no features), so XLA sees
    the conv network as pure dense math over precomputed gather indices.
    """

    levels: Tuple[SparseLevel, ...]
    points: PointBuffer
    point_to_voxel0: jax.Array                    # [n] int32 into level 0 (-1)
    devox: Dict[int, DevoxTable]                  # level index -> table
    p2v: Dict[int, jax.Array]                     # level index -> [n] int32
    level_counts: jax.Array | None = None         # [L] true voxel count per
                                                  # level (> cap = overflow)
