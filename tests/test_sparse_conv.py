"""Sparse conv + kernel map vs a dense-convolution numpy oracle on toy grids.

This is the acceptance test for the engine's core claim: the static-shape
gather-matmul conv computes exactly the sparse convolution torchsparse
computes with gather-GEMM-scatter (reference: torchsparse
backend/convolution/convolution_cuda.cu, nn/functional/conv.py:17-205).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.ops import (
    build_down_kmap,
    build_downsample,
    build_subm_kmap,
    build_up_kmap,
    kernel_offsets,
    sparse_conv,
    unique_coords,
)


def make_sparse_scene(rng, n_active=60, span=8, n_batch=2, cin=5):
    """Random active voxels per batch + features; returns padded arrays."""
    coords = []
    for b in range(n_batch):
        xyz = rng.integers(0, span, size=(n_active, 3))
        xyz = np.unique(xyz, axis=0)
        coords.append(np.concatenate([np.full((len(xyz), 1), b), xyz], axis=1))
    coords = np.concatenate(coords).astype(np.int32)
    feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
    return coords, feats


def dense_oracle_subm(coords, feats, W, offsets, span, n_batch):
    """Dense reference: out[p] = sum_k feat[p + off_k] W_k over active sites."""
    cin, cout = W.shape[1], W.shape[2]
    grid = np.zeros((n_batch, span + 4, span + 4, span + 4, cin), np.float32)
    active = np.zeros((n_batch, span + 4, span + 4, span + 4), bool)
    pad = 2
    for c, f in zip(coords, feats):
        grid[c[0], c[1] + pad, c[2] + pad, c[3] + pad] = f
        active[c[0], c[1] + pad, c[2] + pad, c[3] + pad] = True
    out = {}
    for c in coords:
        acc = np.zeros(cout, np.float32)
        for k, off in enumerate(offsets):
            p = (c[0], c[1] + pad + off[0], c[2] + pad + off[1], c[3] + pad + off[2])
            if active[p]:
                acc += grid[p] @ W[k]
        out[tuple(c)] = acc
    return out


class TestSubmConv:
    @pytest.mark.parametrize("ks", [3, 1, (1, 3, 3)])
    def test_vs_dense_oracle(self, rng, ks):
        span, n_batch, cin, cout = 8, 2, 5, 7
        coords, feats = make_sparse_scene(rng, span=span, n_batch=n_batch, cin=cin)
        n = len(coords)
        cap = n + 13  # deliberately unaligned padding
        offsets = kernel_offsets(ks)
        K = len(offsets)
        W = rng.normal(size=(K, cin, cout)).astype(np.float32)

        pc = np.full((cap, 4), -1, np.int32)
        pc[:n] = coords
        pf = np.zeros((cap, cin), np.float32)
        pf[:n] = feats
        valid = np.zeros(cap, bool)
        valid[:n] = True

        res = unique_coords(jnp.asarray(pc), jnp.asarray(valid), cap)
        # re-order feats to the sorted table order via inverse map
        sf = np.zeros((cap, cin), np.float32)
        sf[np.asarray(res.inverse)[:n]] = feats

        kmap = build_subm_kmap(res.keys, res.coords, res.valid, ks)
        out = np.asarray(
            sparse_conv(jnp.asarray(sf), jnp.asarray(W), kmap, res.valid)
        )

        oracle = dense_oracle_subm(coords, feats, W, offsets, span, n_batch)
        table = np.asarray(res.coords)
        tvalid = np.asarray(res.valid)
        for i in range(cap):
            if tvalid[i]:
                np.testing.assert_allclose(
                    out[i], oracle[tuple(table[i])], rtol=1e-4, atol=1e-4
                )
            else:
                assert np.abs(out[i]).max() == 0

    def test_custom_vjp_matches_autodiff(self, rng):
        """The scatter-free custom VJP (transposed-kmap backward) must equal
        plain JAX autodiff of the naive gather formulation — for both the
        submanifold (flip) and strided (up/down duality) cases."""
        coords, feats = make_sparse_scene(rng)
        n = len(coords)
        res = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
        sf = np.zeros((n, feats.shape[1]), np.float32)
        sf[np.asarray(res.inverse)] = feats
        sf = jnp.asarray(sf)

        def naive(feats, W, kmap, valid):
            safe = jnp.maximum(kmap, 0)
            out = 0
            for k in range(W.shape[0]):
                g = jnp.where((kmap[k] >= 0)[:, None], feats[safe[k]], 0)
                out = out + g @ W[k]
            return jnp.where(valid[:, None], out, 0)

        # submanifold: kmap_t = flip(kmap)
        W = jnp.asarray(rng.normal(size=(27, feats.shape[1], 6)).astype(np.float32))
        kmap = build_subm_kmap(res.keys, res.coords, res.valid, 3)

        def loss_c(f, w):
            return jnp.sum(sparse_conv(f, w, kmap, res.valid, center=13) ** 2)

        def loss_n(f, w):
            return jnp.sum(naive(f, w, kmap, res.valid) ** 2)

        gc = jax.grad(loss_c, argnums=(0, 1))(sf, W)
        gn = jax.grad(loss_n, argnums=(0, 1))(sf, W)
        np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gn[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gn[1]),
                                   rtol=1e-4, atol=1e-4)

        # strided: down conv with kmap_t = up kmap
        coarse = build_downsample(res.coords, res.valid, n)
        dk = build_down_kmap(res.keys, True, coarse.coords, coarse.valid)
        uk = build_up_kmap(coarse.keys, res.coords, res.valid)
        W2 = jnp.asarray(rng.normal(size=(8, feats.shape[1], 6)).astype(np.float32))

        def loss_c2(f, w):
            return jnp.sum(
                sparse_conv(f, w, dk, coarse.valid, kmap_t=uk) ** 2)

        def loss_n2(f, w):
            return jnp.sum(naive(f, w, dk, coarse.valid) ** 2)

        gc2 = jax.grad(loss_c2, argnums=(0, 1))(sf, W2)
        gn2 = jax.grad(loss_n2, argnums=(0, 1))(sf, W2)
        np.testing.assert_allclose(np.asarray(gc2[0]), np.asarray(gn2[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gc2[1]), np.asarray(gn2[1]),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_flows(self, rng):
        coords, feats = make_sparse_scene(rng, n_active=20, span=4)
        n = len(coords)
        res = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
        sf = np.zeros((n, feats.shape[1]), np.float32)
        sf[np.asarray(res.inverse)] = feats
        W = rng.normal(size=(27, feats.shape[1], 6)).astype(np.float32)
        kmap = build_subm_kmap(res.keys, res.coords, res.valid, 3)

        def loss(w, f):
            return jnp.sum(sparse_conv(f, w, kmap, res.valid) ** 2)

        gw, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(W), jnp.asarray(sf))
        assert np.isfinite(np.asarray(gw)).all() and np.abs(np.asarray(gw)).max() > 0
        assert np.isfinite(np.asarray(gf)).all()


class TestDownUp:
    def test_downsample_coords(self, rng):
        coords, _ = make_sparse_scene(rng, span=8)
        n = len(coords)
        res = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
        down = build_downsample(res.coords, res.valid, n)
        expect = np.unique(
            np.concatenate([coords[:, :1], coords[:, 1:] // 2], axis=1), axis=0
        )
        got = np.asarray(down.coords)[np.asarray(down.valid)]
        assert len(got) == len(expect)
        got_s = got[np.lexsort(got.T[::-1])]
        np.testing.assert_array_equal(got_s, expect)

    def test_down_then_up_kmap_are_transposes(self, rng):
        """Every (coarse o, fine i) pair in the down kmap appears with roles
        swapped in the up kmap, and vice versa."""
        coords, _ = make_sparse_scene(rng, span=8)
        n = len(coords)
        fine = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
        coarse = build_downsample(fine.coords, fine.valid, n)

        dk = np.asarray(build_down_kmap(fine.keys, True, coarse.coords, coarse.valid))
        uk = np.asarray(build_up_kmap(coarse.keys, fine.coords, fine.valid))

        down_pairs = set()
        for k in range(dk.shape[0]):
            for o in range(dk.shape[1]):
                if dk[k, o] >= 0:
                    down_pairs.add((k, o, dk[k, o]))  # (offset, coarse, fine)
        up_pairs = set()
        for k in range(uk.shape[0]):
            for f in range(uk.shape[1]):
                if uk[k, f] >= 0:
                    up_pairs.add((k, uk[k, f], f))
        assert down_pairs == up_pairs and len(down_pairs) > 0

    def test_every_fine_voxel_has_parent(self, rng):
        coords, _ = make_sparse_scene(rng, span=8)
        n = len(coords)
        fine = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
        coarse = build_downsample(fine.coords, fine.valid, n)
        uk = np.asarray(build_up_kmap(coarse.keys, fine.coords, fine.valid))
        fvalid = np.asarray(fine.valid)
        hits = (uk >= 0).sum(axis=0)
        # exactly one parity offset fires per valid fine voxel (k=2 s=2)
        np.testing.assert_array_equal(hits[fvalid], 1)
        np.testing.assert_array_equal(hits[~fvalid], 0)


def test_inverse_kmaps_match_lookup(rng):
    """The scatter/parity-derived k=2 kernel maps must equal the
    lookup-based ones exactly (geometry fast path)."""
    import jax.numpy as jnp
    from openpcseg_tpu.core.geometry import build_pyramid, _updown_from_inverse
    from openpcseg_tpu.ops import build_down_kmap, build_up_kmap

    coords, _ = make_sparse_scene(rng, n_active=80, span=16)
    n = len(coords)
    pyr = build_pyramid(jnp.asarray(coords), jnp.ones(n, bool),
                        [n, n, n // 2], subm_kernel=None, updown_kernel=2)
    for l in (1, 2):
        fine, coarse = pyr.levels[l - 1], pyr.levels[l]
        dk_ref = np.asarray(build_down_kmap(
            fine.keys, True, coarse.coords, coarse.valid, 2, 2))
        uk_ref = np.asarray(build_up_kmap(
            coarse.keys, fine.coords, fine.valid, 2, 2))
        np.testing.assert_array_equal(np.asarray(coarse.down_kmap), dk_ref)
        np.testing.assert_array_equal(np.asarray(fine.up_kmap), uk_ref)


class TestWindowConv:
    """window_subm_conv must match sparse_conv exactly (same fwd, same
    grads) — it is the default model path (models/layers.py CONV_IMPL)."""

    def _setup(self, rng, ks=3, cin=5, cout=7, with_zgaps=True):
        from openpcseg_tpu.ops.sparse_conv import window_subm_conv

        coords, feats = make_sparse_scene(rng, span=8, n_batch=2, cin=cin)
        if with_zgaps:
            # force [hit, miss, hit] z-columns: add pairs (z, z+2)
            extra = []
            for b in range(2):
                for i in range(12):
                    x, y, z = rng.integers(0, 6, size=3)
                    extra.append([b, x, y, z])
                    extra.append([b, x, y, z + 2])
            coords = np.concatenate(
                [coords, np.asarray(extra, np.int32)], axis=0)
            feats = np.concatenate(
                [feats,
                 rng.normal(size=(len(extra), cin)).astype(np.float32)])
        cap = 256
        u = unique_coords(jnp.asarray(coords),
                          jnp.ones((len(coords),), bool), cap)
        # features aligned to the unique sorted table rows
        f = np.zeros((cap, cin), np.float32)
        seen = set()
        inv = np.asarray(u.inverse)
        for i, c in enumerate(coords):
            r = inv[i]
            if r >= 0 and r not in seen:
                f[r] = feats[i]
                seen.add(r)
        kmap = build_subm_kmap(u.keys, u.coords, u.valid, ks)
        return u, jnp.asarray(f), kmap, kernel_offsets(ks)

    @pytest.mark.parametrize("ks", [3, (1, 3, 3), (3, 1, 3), (3, 3, 1)])
    def test_matches_gather_conv(self, rng, ks):
        from openpcseg_tpu.ops.sparse_conv import window_subm_conv

        u, f, kmap, offs = self._setup(rng, ks=ks)
        k = len(offs)
        W = jnp.asarray(rng.normal(size=(k, 5, 7)).astype(np.float32))
        ref = sparse_conv(f, W, kmap, u.valid, center=k // 2)
        win = window_subm_conv(f, W, kmap, u.valid, offs)
        np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_gather_conv(self, rng):
        from openpcseg_tpu.ops.sparse_conv import window_subm_conv

        u, f, kmap, offs = self._setup(rng)
        W = jnp.asarray(rng.normal(size=(27, 5, 7)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(f.shape[0], 7)).astype(np.float32))

        def loss_ref(f_, W_):
            o = sparse_conv(f_, W_, kmap, u.valid, center=13)
            return jnp.sum((o - tgt) ** 2)

        def loss_win(f_, W_):
            o = window_subm_conv(f_, W_, kmap, u.valid, offs)
            return jnp.sum((o - tgt) ** 2)

        gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(f, W)
        gf_w, gw_w = jax.grad(loss_win, argnums=(0, 1))(f, W)
        np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gf_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-4)


class TestUp2Conv:
    """sparse_conv_up2 (one-gather parity fast path) vs sparse_conv."""

    def test_matches_generic_transposed_conv(self, rng):
        from openpcseg_tpu.ops.sparse_conv import sparse_conv_up2

        coords, _ = make_sparse_scene(rng, span=8, n_batch=2, cin=4)
        cap_f, cap_c = 256, 128
        uf = unique_coords(jnp.asarray(coords),
                           jnp.ones((len(coords),), bool), cap_f)
        down = build_downsample(uf.coords, uf.valid, cap_c, stride=2)
        up_kmap = build_up_kmap(down.keys, uf.coords, uf.valid,
                                kernel_size=2, stride=2)
        down_kmap = build_down_kmap(uf.keys, True, down.coords, down.valid,
                                    kernel_size=2, stride=2)
        cin, cout = 5, 6
        fc = jnp.asarray(rng.normal(size=(cap_c, cin)).astype(np.float32))
        fc = jnp.where(down.valid[:, None], fc, 0.0)
        W = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(cap_f, cout)).astype(np.float32))

        def loss_ref(f_, W_):
            o = sparse_conv(f_, W_, up_kmap, uf.valid, kmap_t=down_kmap)
            return jnp.sum((o - tgt) ** 2), o

        def loss_up2(f_, W_):
            o = sparse_conv_up2(f_, W_, up_kmap, uf.valid, down_kmap)
            return jnp.sum((o - tgt) ** 2), o

        (lr, o_r), (gf_r, gw_r) = jax.value_and_grad(
            loss_ref, argnums=(0, 1), has_aux=True)(fc, W)
        (lw, o_w), (gf_w, gw_w) = jax.value_and_grad(
            loss_up2, argnums=(0, 1), has_aux=True)(fc, W)
        np.testing.assert_allclose(np.asarray(o_w), np.asarray(o_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gf_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-4)
