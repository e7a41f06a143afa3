"""RPVNet: range-point-voxel tri-branch fusion segmentor, TPU-native.

Re-implementation of the reference RPVNet
(reference: pcseg/model/segmentor/fusion/rpvnet/rpvnet.py:430-749): a
MinkUNet-style voxel branch and an embedded simplified-SalsaNext range
branch (:94-253) fused with a point branch at four gates —

    z_i = voxel_to_point(voxel) + range_to_point(range map)
          + point_transform_i(z_{i-1})                      (:648-704)

with point->voxel mean-scatter and point->range mean-scatter
(range_lib map_count/denselize -> ops/range_fusion.py) feeding the next
stage of each branch. Classifier over concat [z1, z2, z3].
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.tensor import VoxelPyramid
from ..ops.range_fusion import point_to_range, range_to_point
from ..ops.voxelize import voxelize_mean
from .layers import (BLOCKS, BasicConvBlock, MaskedBatchNorm, SparseConv,
                     repeated_blocks)
from .range_salsanext import pixel_shuffle
from .spvcnn import PointTransform


def _bn2d(train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9)


class RPVResContext(nn.Module):
    """(reference rpvnet.py:94-119)"""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        sc = jax.nn.leaky_relu(nn.Conv(self.features, (1, 1))(x))
        r = jax.nn.leaky_relu(nn.Conv(self.features, (3, 3))(sc))
        r1 = _bn2d(train)(r)
        r = jax.nn.leaky_relu(
            nn.Conv(self.features, (3, 3), kernel_dilation=2)(r1))
        r2 = _bn2d(train)(r)
        return sc + r2


class RPVResBlock(nn.Module):
    """(reference rpvnet.py:121-166); returns (pooled, skip) if pooling."""

    features: int
    dropout_rate: float = 0.2
    pooling: bool = True
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        sc = jax.nn.leaky_relu(nn.Conv(self.features, (1, 1))(x))
        r = jax.nn.leaky_relu(nn.Conv(self.features, (3, 3))(x))
        r = _bn2d(train)(r)
        r = sc + r
        drop = nn.Dropout(self.dropout_rate, deterministic=not train)
        if self.pooling:
            p = drop(r) if self.drop_out else r
            p = jax.lax.reduce_window(
                p, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0))) / 9.0
            return p, r
        return (drop(r) if self.drop_out else r), r


class RPVUpBlock(nn.Module):
    """PixelShuffle + skip concat + single conv (reference rpvnet.py:168-203)."""

    features: int
    dropout_rate: float = 0.2
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, skip, train: bool):
        drop = lambda y: nn.Dropout(
            self.dropout_rate, deterministic=not train)(y)
        up = pixel_shuffle(x, 2)
        if self.drop_out:
            up = drop(up)
        up = jnp.concatenate([up, skip], axis=-1)
        if self.drop_out:
            up = drop(up)
        e = jax.nn.leaky_relu(nn.Conv(self.features, (3, 3))(up))
        e = _bn2d(train)(e)
        if self.drop_out:
            e = drop(e)
        return e


class RPVNet(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    NUM_LEVELS = 5
    SUBM_KERNEL = 3
    DEVOX_LEVELS = (4, 2, 0)
    P2V_LEVELS = (4, 2)
    INPUT_MODE = "fusion"

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
    def __call__(self, inputs: Dict[str, jax.Array], pyr: VoxelPyramid,
                 train: bool = False) -> jax.Array:
        cfg = self.model_cfgs
        in_dim = cfg.get("IN_FEATURE_DIM", 5)
        num_layer = cfg.get("NUM_LAYER", [2, 3, 4, 6, 2, 2, 2, 2])
        block_cls = BLOCKS[cfg.get("BLOCK", "ResBlock")]
        expansion = {"ResBlock": 1, "Bottleneck": 4}[cfg.get("BLOCK", "ResBlock")]
        cr = cfg.get("cr", 1.0)
        cs = [int(cr * x) for x in
              cfg.get("PLANES", [32, 32, 64, 128, 256, 256, 128, 96, 96])]
        dropout_p = cfg.get("DROPOUT_P", 0.3)
        multi_scale = cfg.get("MULTI_SCALE", "concat")

        voxel_feats = inputs["voxel_feats"]
        rimg = inputs["range_image"]          # [B, H, W, 5]
        pxpy = inputs["pxpy"]                 # [P, 2] per point (level-0 site)
        bsz, h, w, _ = rimg.shape

        lv = pyr.levels
        p_valid = pyr.points.valid
        p_batch = pyr.points.batch

        r2p = lambda fmap: range_to_point(fmap, pxpy, p_batch, p_valid)
        p2r = lambda pf, hh, ww: point_to_range(
            pf, pxpy, p_batch, p_valid, bsz, hh, ww)

        raw = voxel_feats[:, :in_dim].astype(self.compute_dtype)

        # stems
        x = raw
        for _ in range(2):
            x = BasicConvBlock(
                cs[0], kernel_size=3, axis_name=self.axis_name,
                compute_dtype=self.compute_dtype,
            )(x, lv[0].subm_kmap, lv[0].valid, train)
        x0 = x
        r = rimg
        for _ in range(3):  # range stem (rpvnet.py:215-219)
            r = RPVResContext(cs[0])(r, train)
        r_x0 = r

        # GATE 0 (rpvnet.py:648-651)
        z0 = pyr.devox[0].apply(x0) + r2p(r_x0) + PointTransform(
            cs[0], self.axis_name)(raw, p_valid, train)

        # voxel stages
        x1 = self._stage(z0, lv[0], lv[1], cs[1], num_layer[0], block_cls, train)
        x2 = self._stage(x1, lv[1], lv[2], cs[2], num_layer[1], block_cls, train)
        x3 = self._stage(x2, lv[2], lv[3], cs[3], num_layer[2], block_cls, train)
        x4 = self._stage(x3, lv[3], lv[4], cs[4], num_layer[3], block_cls, train)
        # range stages (rpvnet.py:658-663)
        r_in = p2r(z0, h, w)
        r_x1, r_s1 = RPVResBlock(cs[1], pooling=True, drop_out=False)(r_in, train)
        r_x2, r_s2 = RPVResBlock(cs[2], pooling=True)(r_x1, train)
        r_x3, r_s3 = RPVResBlock(cs[3], pooling=True)(r_x2, train)
        r_x4, r_s4 = RPVResBlock(cs[4], pooling=True)(r_x3, train)
        r_x4, _ = RPVResBlock(cs[4], pooling=False)(r_x4, train)

        # GATE 1 (rpvnet.py:665-668)
        z1 = pyr.devox[4].apply(x4) + r2p(r_x4) + PointTransform(
            cs[4] * expansion, self.axis_name)(z0, p_valid, train)

        y1 = voxelize_mean(z1, pyr.p2v[4], lv[4].capacity)
        r_y1 = p2r(z1, h // 16, w // 16)
        y1 = nn.Dropout(dropout_p, deterministic=not train)(y1)
        y1 = self._up(y1, x3, lv[4], lv[3], cs[5], num_layer[4], block_cls, train)
        y2 = self._up(y1, x2, lv[3], lv[2], cs[6], num_layer[5], block_cls, train)
        r_y1 = RPVUpBlock(cs[5])(r_y1, r_s4, train)
        r_y2 = RPVUpBlock(cs[6])(r_y1, r_s3, train)

        # GATE 2 (rpvnet.py:683-686)
        z2 = pyr.devox[2].apply(y2) + r2p(r_y2) + PointTransform(
            cs[6] * expansion, self.axis_name)(z1, p_valid, train)

        y3 = voxelize_mean(z2, pyr.p2v[2], lv[2].capacity)
        r_y3 = p2r(z2, h // 4, w // 4)
        y3 = nn.Dropout(dropout_p, deterministic=not train)(y3)
        y3 = self._up(y3, x1, lv[2], lv[1], cs[7], num_layer[6], block_cls, train)
        y4 = self._up(y3, x0, lv[1], lv[0], cs[8], num_layer[7], block_cls, train)
        r_y3 = RPVUpBlock(cs[7])(r_y3, r_s2, train)
        r_y4 = RPVUpBlock(cs[8], drop_out=False)(r_y3, r_s1, train)

        # GATE 3 (rpvnet.py:701-704)
        z3 = pyr.devox[0].apply(y4) + r2p(r_y4) + PointTransform(
            cs[8] * expansion, self.axis_name)(z2, p_valid, train)

        if multi_scale == "concat":
            feat = jnp.concatenate([z1, z2, z3], axis=-1)
        else:
            feat = z3
        logits = nn.Dense(self.num_class, name="classifier")(
            feat.astype(jnp.float32))
        return jnp.where(p_valid[:, None], logits, 0.0)
