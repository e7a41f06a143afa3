"""SPVCNN: sparse point-voxel CNN segmentor, TPU-native.

Re-implementation of the reference SPVCNN
(reference: pcseg/model/segmentor/fusion/spvcnn/spvcnn.py:189-484, after
mit-han-lab/spvnas): the MinkUNet skeleton plus a persistent point branch —
after selected voxel stages the features are devoxelized to points, a
point-transform MLP residual is added, and the points are mean-voxelized
back into the current resolution (spvcnn.py:399-449). Classifier over the
concatenation of the three point-scale features [z1, z2, z3].

All point<->voxel transfer tables (devox trilinear + containing-voxel p2v)
come precomputed in the VoxelPyramid; the mean-voxelize is a segment-mean
(reference: point_to_voxel -> spvoxelize, minkunet/utils.py:41-64).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.tensor import VoxelPyramid
from ..ops.voxelize import voxelize_mean
from .layers import (BLOCKS, BasicConvBlock, MaskedBatchNorm, SparseConv,
                     repeated_blocks)


class PointTransform(nn.Module):
    """Linear -> BN -> ReLU point MLP (reference spvcnn.py:335-351)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, valid, train: bool):
        x = nn.Dense(self.features)(x)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, valid, not train)
        return jax.nn.relu(x)


class SPVCNN(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    NUM_LEVELS = 5
    SUBM_KERNEL = 3
    DEVOX_LEVELS = (4, 2, 0)
    P2V_LEVELS = (4, 2)

    @classmethod
    def geometry_spec(cls, model_cfgs) -> dict:
        del model_cfgs
        return dict(
            num_levels=cls.NUM_LEVELS,
            subm_kernel=cls.SUBM_KERNEL,
            updown_kernel=2,
            devox_levels=cls.DEVOX_LEVELS,
            p2v_levels=cls.P2V_LEVELS,
        )

    def _stage(self, feats, fine, coarse, planes, n_blocks, block_cls, train):
        x = BasicConvBlock(
            feats.shape[-1], kernel_size=2, axis_name=self.axis_name,
            pair_kmap=fine.up_one_hot, compute_dtype=self.compute_dtype,
        )(feats, coarse.down_kmap, coarse.valid, train, kmap_t=fine.up_kmap)
        return repeated_blocks(
            block_cls, planes, n_blocks, self.axis_name, self.compute_dtype,
            x, coarse.subm_kmap, coarse.valid, train)

    def _up(self, feats, skip_feats, coarse, fine, planes, n_blocks,
            block_cls, train):
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
        expansion = {"ResBlock": 1, "Bottleneck": 4}[cfg.get("BLOCK", "Bottleneck")]
        cr = cfg.get("cr", 1.0)
        cs = [int(cr * x) for x in
              cfg.get("PLANES", [32, 32, 64, 128, 256, 256, 128, 96, 96])]
        dropout_p = cfg.get("DROPOUT_P", 0.3)
        multi_scale = cfg.get("MULTI_SCALE", "concat")

        lv = pyr.levels
        pts_valid = pyr.points.valid

        x = voxel_feats[:, :in_dim].astype(self.compute_dtype)
        for _ in range(2):  # stem (reference spvcnn.py:212-227)
            x = BasicConvBlock(
                cs[0], kernel_size=3, axis_name=self.axis_name,
                compute_dtype=self.compute_dtype,
            )(x, lv[0].subm_kmap, lv[0].valid, train)
        x0 = x
        # z0 = voxel_to_point at stride 1 == identity for voxel-modality
        z0 = pyr.devox[0].apply(x0)

        # x1 = point_to_voxel(x0, z0): identity at stride 1 (points == sites)
        x1 = self._stage(z0, lv[0], lv[1], cs[1], num_layer[0], block_cls, train)
        x2 = self._stage(x1, lv[1], lv[2], cs[2], num_layer[1], block_cls, train)
        x3 = self._stage(x2, lv[2], lv[3], cs[3], num_layer[2], block_cls, train)
        x4 = self._stage(x3, lv[3], lv[4], cs[4], num_layer[3], block_cls, train)

        z1 = pyr.devox[4].apply(x4)
        z1 = z1 + PointTransform(cs[4] * expansion, self.axis_name)(
            z0, pts_valid, train)

        # y1 = point_to_voxel(x4, z1): mean-scatter points into level-4 sites
        y1 = voxelize_mean(z1, pyr.p2v[4], lv[4].capacity)
        y1 = nn.Dropout(dropout_p, deterministic=not train)(y1)
        y1 = self._up(y1, x3, lv[4], lv[3], cs[5], num_layer[4], block_cls, train)
        y2 = self._up(y1, x2, lv[3], lv[2], cs[6], num_layer[5], block_cls, train)

        z2 = pyr.devox[2].apply(y2)
        z2 = z2 + PointTransform(cs[6] * expansion, self.axis_name)(
            z1, pts_valid, train)

        y3 = voxelize_mean(z2, pyr.p2v[2], lv[2].capacity)
        y3 = nn.Dropout(dropout_p, deterministic=not train)(y3)
        y3 = self._up(y3, x1, lv[2], lv[1], cs[7], num_layer[6], block_cls, train)
        y4 = self._up(y3, x0, lv[1], lv[0], cs[8], num_layer[7], block_cls, train)

        z3 = pyr.devox[0].apply(y4)
        z3 = z3 + PointTransform(cs[8] * expansion, self.axis_name)(
            z2, pts_valid, train)

        if multi_scale == "concat":
            feat = jnp.concatenate([z1, z2, z3], axis=-1)
        else:
            feat = z3
        logits = nn.Dense(self.num_class, name="classifier")(
            feat.astype(jnp.float32))
        return jnp.where(pts_valid[:, None], logits, 0.0)