"""MinkUNet: sparse 3D UNet segmentor, TPU-native.

Re-implementation of the reference MinkUNet
(reference: pcseg/model/segmentor/voxel/minkunet/minkunet.py:186-455,
originally after MinkowskiEngine / SPVNAS): stem + 4 down stages
(stride-2 conv + residual blocks) + 4 up stages (transposed conv + skip
concat) + a classifier over the concatenation of three devoxelized scales
[z1, z2, z3] (minkunet.py:400-422).

Differences by design (TPU-first, not a translation):
- all geometry (coords per stride, kernel maps, devoxelize tables) comes
  precomputed in a VoxelPyramid; the module is pure dense math;
- fixed-capacity padded buffers with validity masks everywhere;
- BatchNorm is masked + cross-device via pmean (MaskedBatchNorm).

Config knobs honored (reference minkunet.py:193-205 and
tools/cfgs/voxel/semantic_kitti/minkunet_mk34_cr10.yaml): IN_FEATURE_DIM,
NUM_LAYER, PLANES, cr, BLOCK (ResBlock/Bottleneck), DROPOUT_P.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.tensor import VoxelPyramid
from .layers import (BLOCKS, BasicConvBlock, MaskedBatchNorm, SparseConv,
                     repeated_blocks)


class MinkUNet(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    # geometry this model needs from the data pipeline
    NUM_LEVELS = 5
    SUBM_KERNEL = 3
    DEVOX_LEVELS = (4, 2, 0)

    @classmethod
    def geometry_spec(cls, model_cfgs) -> dict:
        del model_cfgs
        return dict(
            num_levels=cls.NUM_LEVELS,
            subm_kernel=cls.SUBM_KERNEL,
            updown_kernel=2,
            devox_levels=cls.DEVOX_LEVELS,
            p2v_levels=(),
        )

    def _stage(self, feats, fine, coarse, planes, n_blocks, block_cls, train):
        """stride-2 conv + residual blocks (reference minkunet.py:227-270)."""
        x = BasicConvBlock(
            feats.shape[-1], kernel_size=2, axis_name=self.axis_name,
            pair_kmap=fine.up_one_hot, compute_dtype=self.compute_dtype,
        )(feats, coarse.down_kmap, coarse.valid, train, kmap_t=fine.up_kmap)
        return repeated_blocks(
            block_cls, planes, n_blocks, self.axis_name, self.compute_dtype,
            x, coarse.subm_kmap, coarse.valid, train)

    def _up(self, feats, skip_feats, coarse, fine, planes, n_blocks,
            block_cls, train):
        """transposed conv + skip concat + blocks (reference
        minkunet.py:272-330, torchsparse.cat at :404)."""
        x = SparseConv(planes, kernel_size=2,
                       one_hot_kmap=fine.up_one_hot,
                       compute_dtype=self.compute_dtype)(
            feats, fine.up_kmap, fine.valid, kmap_t=coarse.down_kmap)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, fine.valid, not train)
        x = jax.nn.relu(x)
        x = jnp.concatenate([x, skip_feats], axis=-1)
        return repeated_blocks(
            block_cls, planes, n_blocks, self.axis_name, self.compute_dtype,
            x, fine.subm_kmap, fine.valid, train)

    @nn.compact
    def __call__(self, voxel_feats: jax.Array, pyr: VoxelPyramid,
                 train: bool = False) -> jax.Array:
        cfg = self.model_cfgs
        in_dim = cfg.get("IN_FEATURE_DIM", 4)
        num_layer = cfg.get("NUM_LAYER", [2, 3, 4, 6, 2, 2, 2, 2])
        block_cls = BLOCKS[cfg.get("BLOCK", "Bottleneck")]
        cr = cfg.get("cr", 1.0)
        cs = [int(cr * x) for x in
              cfg.get("PLANES", [32, 32, 64, 128, 256, 256, 128, 96, 96])]
        dropout_p = cfg.get("DROPOUT_P", 0.3)

        lv = pyr.levels
        assert len(lv) >= self.NUM_LEVELS

        x = voxel_feats[:, :in_dim].astype(self.compute_dtype)

        # stem: two subm k3 convs at level 0 (reference minkunet.py:207-222)
        for _ in range(2):
            x = BasicConvBlock(
                cs[0], kernel_size=3, axis_name=self.axis_name,
                compute_dtype=self.compute_dtype,
            )(x, lv[0].subm_kmap, lv[0].valid, train)
        x0 = x

        x1 = self._stage(x0, lv[0], lv[1], cs[1], num_layer[0], block_cls, train)
        x2 = self._stage(x1, lv[1], lv[2], cs[2], num_layer[1], block_cls, train)
        x3 = self._stage(x2, lv[2], lv[3], cs[3], num_layer[2], block_cls, train)
        x4 = self._stage(x3, lv[3], lv[4], cs[4], num_layer[3], block_cls, train)

        z1 = pyr.devox[4].apply(x4)

        x4 = nn.Dropout(dropout_p, deterministic=not train)(x4)
        y1 = self._up(x4, x3, lv[4], lv[3], cs[5], num_layer[4], block_cls, train)
        y2 = self._up(y1, x2, lv[3], lv[2], cs[6], num_layer[5], block_cls, train)
        z2 = pyr.devox[2].apply(y2)

        y2 = nn.Dropout(dropout_p, deterministic=not train)(y2)
        y3 = self._up(y2, x1, lv[2], lv[1], cs[7], num_layer[6], block_cls, train)
        y4 = self._up(y3, x0, lv[1], lv[0], cs[8], num_layer[7], block_cls, train)
        z3 = pyr.devox[0].apply(y4)

        feat = jnp.concatenate([z1, z2, z3], axis=-1)
        logits = nn.Dense(self.num_class, name="classifier")(
            feat.astype(jnp.float32))
        return jnp.where(pyr.points.valid[:, None], logits, 0.0)
