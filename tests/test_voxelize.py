"""Voxelize / trilinear devoxelize vs numpy oracles.

Covers spvoxelize / spdevoxelize / calc_ti_weights behavior (reference:
torchsparse backend/voxelize/voxelize_cuda.cu:12-25,
backend/devoxelize/devoxelize_cuda.cu:11-33,
nn/functional/devoxelize.py:12-49) and the point->voxel bridge semantics
(reference: pcseg/model/segmentor/voxel/minkunet/utils.py:11-105).
"""
import jax.numpy as jnp
import numpy as np

from openpcseg_tpu.ops import (
    devoxelize_indices_weights,
    devoxelize_trilinear,
    segment_max,
    unique_coords,
    voxel_to_point_nearest,
    voxelize_mean,
)


class TestVoxelizeMean:
    def test_vs_numpy(self, rng):
        n, v, c = 200, 40, 6
        idx = rng.integers(-1, v, size=n).astype(np.int32)  # some dropped
        feats = rng.normal(size=(n, c)).astype(np.float32)
        out = np.asarray(voxelize_mean(jnp.asarray(feats), jnp.asarray(idx), v))
        for j in range(v):
            sel = feats[idx == j]
            expect = sel.mean(axis=0) if len(sel) else np.zeros(c)
            np.testing.assert_allclose(out[j], expect, rtol=1e-5, atol=1e-6)

    def test_segment_max(self, rng):
        n, v = 100, 10
        idx = rng.integers(-1, v, size=n).astype(np.int32)
        feats = rng.normal(size=(n, 3)).astype(np.float32)
        out = np.asarray(segment_max(jnp.asarray(feats), jnp.asarray(idx), v))
        for j in range(v):
            sel = feats[idx == j]
            expect = sel.max(axis=0) if len(sel) else np.zeros(3)
            np.testing.assert_allclose(out[j], expect, rtol=1e-6)


class TestDevoxelize:
    def _setup(self, rng, n_pts=50, span=6):
        # voxels = all integer sites so every corner exists
        xyz = np.stack(np.meshgrid(*[np.arange(span)] * 3, indexing="ij"), -1)
        coords = xyz.reshape(-1, 3)
        coords = np.concatenate([np.zeros((len(coords), 1), np.int64), coords], 1)
        coords = coords.astype(np.int32)
        res = unique_coords(jnp.asarray(coords), jnp.ones(len(coords), bool), len(coords))
        feats = rng.normal(size=(len(coords), 4)).astype(np.float32)
        # order feats to table order
        sf = np.zeros_like(feats)
        sf[np.asarray(res.inverse)] = feats
        pts = rng.uniform(0.0, span - 1.001, size=(n_pts, 3)).astype(np.float32)
        return res, sf, pts

    def test_trilinear_interpolates_linear_field(self, rng):
        """A linear function sampled at voxel corners must be reproduced
        exactly by trilinear interpolation at arbitrary points."""
        res, _, pts = self._setup(rng)
        table = np.asarray(res.coords).astype(np.float32)
        a = np.array([0.3, -1.2, 2.0], np.float32)
        vf = (table[:, 1:] * a).sum(1, keepdims=True) + 0.7
        vf = vf * np.asarray(res.valid)[:, None]

        idx, w = devoxelize_indices_weights(
            jnp.asarray(pts), jnp.zeros(len(pts), jnp.int32),
            jnp.ones(len(pts), bool), res.keys, stride=1,
        )
        out = np.asarray(devoxelize_trilinear(jnp.asarray(vf), idx, w))
        expect = (pts * a).sum(1, keepdims=True) + 0.7
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    def test_weights_sum_to_one_inside(self, rng):
        res, _, pts = self._setup(rng)
        idx, w = devoxelize_indices_weights(
            jnp.asarray(pts), jnp.zeros(len(pts), jnp.int32),
            jnp.ones(len(pts), bool), res.keys, stride=1,
        )
        np.testing.assert_allclose(np.asarray(w).sum(0), 1.0, rtol=1e-5)

    def test_integer_points_hit_single_corner(self, rng):
        res, sf, _ = self._setup(rng)
        pts = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]], np.float32)
        idx, w = devoxelize_indices_weights(
            jnp.asarray(pts), jnp.zeros(2, jnp.int32), jnp.ones(2, bool),
            res.keys, stride=1,
        )
        w = np.asarray(w)
        # exactly one corner per point carries weight 1 (w is [8, N])
        np.testing.assert_array_equal((w == 1.0).sum(axis=0), 1)
        np.testing.assert_allclose(w.sum(0), 1.0, rtol=1e-6)
        out = np.asarray(devoxelize_trilinear(jnp.asarray(sf), idx, w))
        nearest = np.asarray(
            voxel_to_point_nearest(jnp.asarray(sf), idx[0])
        )
        np.testing.assert_allclose(out, nearest, rtol=1e-6)

    def test_missing_corners_contribute_zero(self, rng):
        # single voxel at origin; a point at (0.5,0.5,0.5) has 7 missing corners
        coords = jnp.asarray([[0, 0, 0, 0]], jnp.int32)
        res = unique_coords(coords, jnp.ones(1, bool), 1)
        vf = jnp.asarray([[2.0]])
        pts = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
        idx, w = devoxelize_indices_weights(
            pts, jnp.zeros(1, jnp.int32), jnp.ones(1, bool), res.keys, stride=1
        )
        out = np.asarray(devoxelize_trilinear(vf, idx, w))
        # only corner (0,0,0) exists with weight 0.125 -> 0.25 (no renorm,
        # matching reference spdevoxelize idx=-1 handling)
        np.testing.assert_allclose(out, [[0.25]], rtol=1e-6)

    def test_stride_scaling(self, rng):
        # voxels on the stride-2 grid, point between them
        coords = jnp.asarray([[0, 0, 0, 0], [0, 1, 0, 0]], jnp.int32)  # coarse units
        res = unique_coords(coords, jnp.ones(2, bool), 2)
        table = np.asarray(res.coords)
        vf = (table[:, 1:2]).astype(np.float32) * 10.0  # f = 10 * x_coarse
        # point at fine coord x=1 -> coarse 0.5 -> expect 5.0
        pts = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        idx, w = devoxelize_indices_weights(
            pts, jnp.zeros(1, jnp.int32), jnp.ones(1, bool), res.keys, stride=2
        )
        out = np.asarray(devoxelize_trilinear(jnp.asarray(vf), idx, w))
        np.testing.assert_allclose(out, [[5.0]], rtol=1e-6)


class TestSharedCornerDevox:
    def test_pyramid_devox_matches_direct(self, rng):
        """The shared-corner (ancestor-chain) devox fast path must equal the
        direct per-point lookup tables exactly."""
        import jax.numpy as jnp
        from openpcseg_tpu.core.geometry import build_pyramid

        n = 900
        coords = np.concatenate([
            rng.integers(0, 2, (n, 1)), rng.integers(0, 40, (n, 2)),
            rng.integers(0, 12, (n, 1))], 1).astype(np.int32)
        res = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), 1024)
        pyr = build_pyramid(res.coords, res.valid, [1024, 1024, 768],
                            subm_kernel=None, updown_kernel=2,
                            devox_levels=(1, 2), level0_keys=res.keys)
        pts = pyr.points
        for l in (1, 2):
            idx_ref, w_ref = devoxelize_indices_weights(
                pts.coords, pts.batch, pts.valid,
                pyr.levels[l].keys, stride=2 ** l)
            np.testing.assert_array_equal(
                np.asarray(pyr.devox[l].idx), np.asarray(idx_ref),
                err_msg=f"level {l} idx")
            np.testing.assert_allclose(
                np.asarray(pyr.devox[l].weights), np.asarray(w_ref),
                rtol=1e-6, err_msg=f"level {l} weights")


class TestDevoxTransposeBounds:
    def test_scatterfree_vjp_matches_autodiff(self, rng):
        # monotone idx rows (sorted point keys + constant corner offsets)
        import jax
        import jax.numpy as jnp
        from openpcseg_tpu.ops.voxelize import (
            devox_transpose_bounds, devoxelize_trilinear)

        n, v, c = 300, 64, 10
        idx = np.full((8, n), -1, np.int32)
        for k in range(8):
            hits = rng.random(n) > 0.25
            vals = np.sort(rng.integers(0, v, hits.sum()))
            idx[k, np.where(hits)[0]] = vals
        w = rng.random((8, n)).astype(np.float32)
        w[idx < 0] = 0.0
        vox = rng.normal(size=(v, c)).astype(np.float32)
        dout_seed = rng.normal(size=(n, c)).astype(np.float32)

        idx_j, w_j = jnp.asarray(idx), jnp.asarray(w)
        lo, hi = devox_transpose_bounds(idx_j, v)

        def loss_auto(x):
            return jnp.sum(devoxelize_trilinear(x, idx_j, w_j)
                           * jnp.asarray(dout_seed))

        def loss_fast(x):
            return jnp.sum(devoxelize_trilinear(x, idx_j, w_j, lo=lo, hi=hi)
                           * jnp.asarray(dout_seed))

        ga = jax.grad(loss_auto)(jnp.asarray(vox))
        gf = jax.grad(loss_fast)(jnp.asarray(vox))
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ga),
                                   rtol=2e-4, atol=2e-4)

    def test_forward_unchanged(self, rng):
        import jax.numpy as jnp
        from openpcseg_tpu.ops.voxelize import (
            devox_transpose_bounds, devoxelize_trilinear)
        n, v, c = 100, 32, 6
        idx = np.full((8, n), -1, np.int32)
        for k in range(8):
            hits = rng.random(n) > 0.3
            idx[k, np.where(hits)[0]] = np.sort(
                rng.integers(0, v, hits.sum()))
        w = rng.random((8, n)).astype(np.float32)
        w[idx < 0] = 0.0
        vox = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32))
        lo, hi = devox_transpose_bounds(jnp.asarray(idx), v)
        a = devoxelize_trilinear(vox, jnp.asarray(idx), jnp.asarray(w))
        b = devoxelize_trilinear(vox, jnp.asarray(idx), jnp.asarray(w),
                                 lo=lo, hi=hi)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)
