"""Tree lookup vs reference binary search — exact parity on random tables."""
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.ops import lookup_coords, make_keys, unique_coords
from openpcseg_tpu.ops.coords import lookup_keys, lookup_keys_bsearch


@pytest.mark.parametrize("n,cap", [
    (40, 64),          # tiny: brute-force path
    (300, 512),        # one tree level
    (5000, 8192),      # two levels
    (60000, 65536),    # three levels
])
def test_tree_matches_bsearch(rng, n, cap):
    coords = np.concatenate([
        rng.integers(0, 3, (n, 1)), rng.integers(0, 900, (n, 2)),
        rng.integers(0, 60, (n, 1))], 1).astype(np.int32)
    res = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), cap)

    # queries: hits, misses, invalids
    q = np.concatenate([
        coords[rng.integers(0, n, 500)],
        coords[rng.integers(0, n, 500)] + np.array([0, 1000, 0, 0], np.int32),
        coords[rng.integers(0, n, 100)],
    ])
    qv = np.ones(len(q), bool)
    qv[-100:] = False
    qk = make_keys(jnp.asarray(q), jnp.asarray(qv))

    got = np.asarray(lookup_keys(res.keys, qk))
    ref = np.asarray(lookup_keys_bsearch(res.keys, qk))
    np.testing.assert_array_equal(got, ref)
    assert (got[:500] >= 0).all()
    assert (got[500:1000] == -1).all()
    assert (got[-100:] == -1).all()


def test_multidim_queries(rng):
    n = 500
    coords = np.concatenate([
        np.zeros((n, 1), np.int64), rng.integers(0, 50, (n, 3))], 1
    ).astype(np.int32)
    res = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), 512)
    q = np.broadcast_to(coords[None], (8, n, 4)).copy()
    idx = lookup_coords(res.keys, jnp.asarray(q), jnp.ones((8, n), bool))
    assert idx.shape == (8, n)
    out = np.asarray(res.coords)
    got = np.asarray(idx)
    assert (got >= 0).all()
    np.testing.assert_array_equal(out[got[3]], coords)


def test_z3_matches_three_lookups(rng):
    """lookup_keys_z3 must equal three independent lookups of (z-1, z, z+1),
    including edge rows and misses."""
    import jax.numpy as jnp
    from openpcseg_tpu.ops.coords import lookup_keys_z3

    n = 4000
    coords = np.concatenate([
        rng.integers(0, 2, (n, 1)), rng.integers(0, 40, (n, 2)),
        rng.integers(0, 6, (n, 1))], 1).astype(np.int32)  # dense z -> many hits
    res = unique_coords(jnp.asarray(coords), jnp.ones(n, bool), 4096)

    q = np.concatenate([
        coords[rng.integers(0, n, 800)],
        coords[rng.integers(0, n, 200)] + np.array([0, 500, 0, 0], np.int32),
    ])
    qv = np.ones(len(q), bool)
    qv[-50:] = False
    qk = make_keys(jnp.asarray(q), jnp.asarray(qv))

    got = np.asarray(lookup_keys_z3(res.keys, qk))
    for j, dz in enumerate((-1, 0, 1)):
        qq = q.copy()
        qq[:, 3] += dz
        ref = np.asarray(lookup_coords(res.keys, jnp.asarray(qq),
                                       jnp.asarray(qv)))
        np.testing.assert_array_equal(got[j], ref, err_msg=f"dz={dz}")
