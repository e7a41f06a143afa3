"""Cylinder3D (Cylinder_TS): cylindrical-partition asymmetric sparse UNet.

Re-implementation of the reference Cylinder_TS
(reference: pcseg/model/segmentor/voxel/cylinder3d/cylinder_ts.py:388-591,
after xinge008/Cylinder3D): point MLP (PPmodel, :400-413) -> scatter-max
voxelize onto the cylindrical grid -> fea_compression to 16ch ->
asymmetric-kernel sparse UNet (ResContext/Res/Up/Recon blocks :88-385,
conv factories :45-86) -> sparse-conv logits head (:461-464) + optional
point-refinement head (:468-475).

TPU-native mapping:
- every asymmetric submanifold kernel ((1,3,3), (3,1,3), (3,1,1), ...) is a
  static row-subset of ONE full 27-offset kernel map per level
  (ops.kmap.subm_subset_indices) — replacing the reference's indice_key
  sharing of torchsparse kernel maps;
- the (2,2,1) height-preserving pools are per-axis down factors in the
  pyramid (down_factors);
- scatter-max voxelize = ops.segment_max over the precomputed point->voxel
  index (replacing torch_scatter.scatter_max, seg_utils.py:176-180).

Quirk preserved: the reference applies activation BEFORE BatchNorm in the
down path blocks (cylinder_ts.py:138-154) and BN before sigmoid in
ReconBlock — replicated exactly.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.tensor import SparseLevel, VoxelPyramid
from ..ops.kmap import subm_subset_indices
from ..ops.segment import segment_max
from .layers import MaskedBatchNorm, SparseConv

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default


def _leaky(x):
    return jax.nn.leaky_relu(x, LEAKY_SLOPE)


class AsymSubmConv(nn.Module):
    """Submanifold conv with an asymmetric kernel sliced from the level's
    full 27-offset kmap."""

    features: int
    kernel_size: tuple
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lvl: SparseLevel):
        sub = subm_subset_indices(3, self.kernel_size)
        kmap = lvl.subm_kmap[jnp.asarray(sub)]
        return SparseConv(
            self.features, kernel_size=self.kernel_size,
            compute_dtype=self.compute_dtype,
        )(x, kmap, lvl.valid)


class ConvActBN(nn.Module):
    """conv -> LeakyReLU -> BN (down-path order, cylinder_ts.py:138-154)."""

    features: int
    kernel_size: tuple
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lvl: SparseLevel, train: bool):
        x = AsymSubmConv(self.features, self.kernel_size,
                         self.compute_dtype)(x, lvl)
        x = _leaky(x)
        return MaskedBatchNorm(axis_name=self.axis_name)(x, lvl.valid, not train)


class ResContextBlock(nn.Module):
    """(reference cylinder_ts.py:88-155)"""

    features: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lvl, train):
        sc = ConvActBN(self.features, (1, 3, 3), self.axis_name,
                       self.compute_dtype)(x, lvl, train)
        sc = ConvActBN(self.features, (3, 1, 3), self.axis_name,
                       self.compute_dtype)(sc, lvl, train)
        res = ConvActBN(self.features, (3, 1, 3), self.axis_name,
                        self.compute_dtype)(x, lvl, train)
        res = ConvActBN(self.features, (1, 3, 3), self.axis_name,
                        self.compute_dtype)(res, lvl, train)
        return res + sc


class CylResBlock(nn.Module):
    """Asymmetric residual block + optional strided pool conv
    (reference cylinder_ts.py:158-249). Returns (pooled, skip)."""

    features: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lvl: SparseLevel, coarse: Optional[SparseLevel],
                 train) -> Tuple[Optional[jax.Array], jax.Array]:
        sc = ConvActBN(self.features, (3, 1, 3), self.axis_name,
                       self.compute_dtype)(x, lvl, train)
        sc = ConvActBN(self.features, (1, 3, 3), self.axis_name,
                       self.compute_dtype)(sc, lvl, train)
        res = ConvActBN(self.features, (1, 3, 3), self.axis_name,
                        self.compute_dtype)(x, lvl, train)
        res = ConvActBN(self.features, (3, 1, 3), self.axis_name,
                        self.compute_dtype)(res, lvl, train)
        res = res + sc
        if coarse is None:
            return None, res
        pooled = SparseConv(self.features, kernel_size=3,
                            compute_dtype=self.compute_dtype)(
            res, coarse.down_kmap, coarse.valid, kmap_t=lvl.up_kmap)
        return pooled, res


class CylUpBlock(nn.Module):
    """Transposed-conv up block (reference cylinder_ts.py:252-321)."""

    features: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, coarse: SparseLevel, fine: SparseLevel, train):
        up = ConvActBN(self.features, (3, 3, 3), self.axis_name,
                       self.compute_dtype)(x, coarse, train)
        up = SparseConv(self.features, kernel_size=3,
                        compute_dtype=self.compute_dtype)(
            up, fine.up_kmap, fine.valid, kmap_t=coarse.down_kmap)
        up = up + skip
        up = ConvActBN(self.features, (1, 3, 3), self.axis_name,
                       self.compute_dtype)(up, fine, train)
        up = ConvActBN(self.features, (3, 1, 3), self.axis_name,
                       self.compute_dtype)(up, fine, train)
        up = ConvActBN(self.features, (3, 3, 3), self.axis_name,
                       self.compute_dtype)(up, fine, train)
        return up


class ReconBlock(nn.Module):
    """Three 1D-kernel gates, BN -> sigmoid, summed, times input
    (reference cylinder_ts.py:324-385)."""

    features: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lvl, train):
        out = None
        for ks in ((3, 1, 1), (1, 3, 1), (1, 1, 3)):
            g = AsymSubmConv(self.features, ks, self.compute_dtype)(x, lvl)
            g = MaskedBatchNorm(axis_name=self.axis_name)(g, lvl.valid, not train)
            g = jax.nn.sigmoid(g)
            out = g if out is None else out + g
        return out * x


class Cylinder_TS(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    NUM_LEVELS = 5
    INPUT_MODE = "point"

    @classmethod
    def geometry_spec(cls, model_cfgs) -> dict:
        del model_cfgs
        return dict(
            num_levels=cls.NUM_LEVELS,
            subm_kernel=3,
            updown_kernel=3,
            # resBlock2/3 pool all axes; resBlock4/5 preserve height
            # (reference cylinder_ts.py:420-436 height_pooling flags)
            down_factors=[1, 2, 2, (2, 2, 1), (2, 2, 1)],
            devox_levels=(),
            p2v_levels=(0,),
        )

    @nn.compact
    def __call__(self, point_feats: jax.Array, pyr: VoxelPyramid,
                 train: bool = False):
        cfg = self.model_cfgs
        in_dim = cfg.get("IN_FEATURE_DIM", 9)
        init_size = cfg.get("INIT_SIZE", 32)
        point_refinement = cfg.get("POINT_REFINEMENT", True)
        lv = pyr.levels
        p_valid = pyr.points.valid
        p2v0 = pyr.p2v[0]

        # PPmodel point MLP (reference cylinder_ts.py:400-413)
        x = point_feats[:, :in_dim]
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, p_valid, not train)
        for width in (64, 128, 256):
            x = nn.Dense(width)(x)
            x = MaskedBatchNorm(axis_name=self.axis_name)(x, p_valid, not train)
            x = jax.nn.relu(x)
        pp_out = nn.Dense(256)(x)

        # scatter-max voxelize + feature compression (:414-418, :516-518)
        vox = segment_max(pp_out, p2v0, lv[0].capacity)
        vox = jnp.where(lv[0].valid[:, None], vox, 0.0)
        vox = jax.nn.relu(nn.Dense(16)(vox))

        ret = ResContextBlock(init_size, self.axis_name,
                              self.compute_dtype)(vox, lv[0], train)
        down1c, down1b = CylResBlock(2 * init_size, self.axis_name,
                                     self.compute_dtype)(ret, lv[0], lv[1], train)
        down2c, down2b = CylResBlock(4 * init_size, self.axis_name,
                                     self.compute_dtype)(down1c, lv[1], lv[2], train)
        down3c, down3b = CylResBlock(8 * init_size, self.axis_name,
                                     self.compute_dtype)(down2c, lv[2], lv[3], train)
        down4c, down4b = CylResBlock(16 * init_size, self.axis_name,
                                     self.compute_dtype)(down3c, lv[3], lv[4], train)

        up4e = CylUpBlock(16 * init_size, self.axis_name,
                          self.compute_dtype)(down4c, down4b, lv[4], lv[3], train)
        up3e = CylUpBlock(8 * init_size, self.axis_name,
                          self.compute_dtype)(up4e, down3b, lv[3], lv[2], train)
        up2e = CylUpBlock(4 * init_size, self.axis_name,
                          self.compute_dtype)(up3e, down2b, lv[2], lv[1], train)
        up1e = CylUpBlock(2 * init_size, self.axis_name,
                          self.compute_dtype)(up2e, down1b, lv[1], lv[0], train)

        up0e = ReconBlock(2 * init_size, self.axis_name,
                          self.compute_dtype)(up1e, lv[0], train)
        up0e = jnp.concatenate([up0e, up1e], axis=-1)  # 4*init_size

        logits = SparseConv(self.num_class, kernel_size=3, use_bias=True,
                            compute_dtype=self.compute_dtype)(
            up0e, lv[0].subm_kmap, lv[0].valid)

        aux = {}
        if point_refinement:
            # (reference cylinder_ts.py:468-475): gather voxel features at
            # each point's cell, change_dim MLP, residual with PPmodel out
            safe = jnp.maximum(p2v0, 0)
            pf_vox = jnp.where((p2v0 >= 0)[:, None], up0e[safe], 0.0)
            pf_vox = nn.Dense(256)(pf_vox)
            pf_vox = MaskedBatchNorm(axis_name=self.axis_name)(
                pf_vox, p_valid, not train)
            pf_vox = _leaky(pf_vox)
            point_logits = nn.Dense(self.num_class)(pp_out + pf_vox)
            aux["point_refine_logits"] = jnp.where(
                p_valid[:, None], point_logits, 0.0)

        return jnp.where(lv[0].valid[:, None], logits, 0.0), aux
