"""Dense-tile conv prototype vs the gather-formulation sparse conv."""
import jax.numpy as jnp
import numpy as np

from openpcseg_tpu.ops import build_subm_kmap, sparse_conv, unique_coords
from openpcseg_tpu.ops.tiled import (
    build_tiles,
    tiled_subm_conv_voxels,
    tiles_to_voxels,
    voxels_to_tiles,
)


def _scene(rng, n=600, span=20, n_batch=2):
    coords = []
    for b in range(n_batch):
        xyz = np.unique(rng.integers(0, span, (n, 3)), axis=0)
        coords.append(np.concatenate([np.full((len(xyz), 1), b), xyz], 1))
    coords = np.concatenate(coords).astype(np.int32)
    return coords


def test_tile_roundtrip(rng):
    coords = _scene(rng)
    n = len(coords)
    u = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
    tm = build_tiles(u.coords, u.valid, 512)
    feats = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    feats = jnp.where(u.valid[:, None], feats, 0)
    grid = voxels_to_tiles(feats, tm, 512)
    back = tiles_to_voxels(grid, tm)
    np.testing.assert_allclose(np.asarray(back), np.asarray(feats),
                               rtol=1e-6)


def test_tiled_conv_matches_sparse(rng):
    coords = _scene(rng)
    n = len(coords)
    u = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), n)
    feats = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    feats = jnp.where(u.valid[:, None], feats, 0)
    W = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))

    kmap = build_subm_kmap(u.keys, u.coords, u.valid, 3)
    ref = sparse_conv(feats, W, kmap, u.valid, center=13)

    tm = build_tiles(u.coords, u.valid, 512)
    got = tiled_subm_conv_voxels(feats, W, tm, 512, u.valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
