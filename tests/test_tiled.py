"""Dense-tile conv (v2: gather-based halos) vs the gather-formulation
sparse conv — values AND gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.ops import build_subm_kmap, sparse_conv, unique_coords

# The dense-tile formulation is an explored alternative with no production
# call site (the window-column / pallas convs won); its oracle tests live
# in the slow tier.
pytestmark = pytest.mark.slow

from openpcseg_tpu.ops.tiled import (  # noqa: E402
    build_tiles,
    fill_halo,
    tiled_subm_conv_voxels,
    tiles_to_voxels,
    voxels_to_tiles,
)


def _scene(rng, n=600, span=20, n_batch=2):
    coords = []
    for b in range(n_batch):
        xyz = np.unique(rng.integers(0, span, (n, 3)), axis=0)
        coords.append(np.concatenate([np.full((len(xyz), 1), b), xyz], 1))
    return np.concatenate(coords).astype(np.int32)


def _setup(rng):
    coords = _scene(rng)
    n = len(coords)
    u = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
    feats = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    feats = jnp.where(u.valid[:, None], feats, 0)
    return u, feats


def test_tile_roundtrip(rng):
    u, feats = _setup(rng)
    tm = build_tiles(u.coords, u.valid, 512)
    core = voxels_to_tiles(feats, tm, 512)
    back = tiles_to_voxels(core, tm)
    np.testing.assert_allclose(np.asarray(back), np.asarray(feats), rtol=1e-6)


def test_halo_contains_neighbor_cores(rng):
    u, feats = _setup(rng)
    tm = build_tiles(u.coords, u.valid, 512)
    core = voxels_to_tiles(feats, tm, 512)
    ext = np.asarray(fill_halo(core, tm.neighbor_tiles, 512))
    corenp = np.asarray(core)
    nb = np.asarray(tm.neighbor_tiles)
    # +x neighbor: our ext[:, 5, 1:5, 1:5] must equal its core[0, :, :]
    from openpcseg_tpu.ops.tiled import _DIRS
    di = _DIRS.index((1, 0, 0))
    for t in range(40):
        s = nb[di, t]
        if s >= 0:
            np.testing.assert_allclose(
                ext[t, 5, 1:5, 1:5], corenp[s, 0, :, :], rtol=1e-6)


def test_tiled_conv_matches_sparse(rng):
    u, feats = _setup(rng)
    n = feats.shape[0]
    W = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))
    kmap = build_subm_kmap(u.keys, u.coords, u.valid, 3)
    ref = sparse_conv(feats, W, kmap, u.valid, center=13)
    tm = build_tiles(u.coords, u.valid, 512)
    got = tiled_subm_conv_voxels(feats, W, tm, 512, u.valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tiled_conv_grads_match_sparse(rng):
    u, feats = _setup(rng)
    W = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))
    kmap = build_subm_kmap(u.keys, u.coords, u.valid, 3)
    tm = build_tiles(u.coords, u.valid, 512)

    def loss_sparse(f, w):
        return jnp.sum(sparse_conv(f, w, kmap, u.valid, center=13) ** 2)

    def loss_tiled(f, w):
        return jnp.sum(tiled_subm_conv_voxels(f, w, tm, 512, u.valid) ** 2)

    gs = jax.grad(loss_sparse, argnums=(0, 1))(feats, W)
    gt = jax.grad(loss_tiled, argnums=(0, 1))(feats, W)
    np.testing.assert_allclose(np.asarray(gt[0]), np.asarray(gs[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gt[1]), np.asarray(gs[1]),
                               rtol=1e-3, atol=1e-3)
