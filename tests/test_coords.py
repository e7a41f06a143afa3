"""Unit tests for the coordinate key / dedup / lookup engine vs numpy oracles.

Covers the behavior of the reference's sphash + unique + sphashquery stack
(reference: torchsparse nn/functional/{hash,query}.py) on padded buffers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.ops import (
    INT32_MAX,
    lookup_coords,
    make_keys,
    unique_coords,
)


def random_coords(rng, n, n_batch=2, span=50, dup_frac=0.5):
    base = rng.integers(0, span, size=(n, 3)).astype(np.int32)
    b = rng.integers(0, n_batch, size=(n, 1)).astype(np.int32)
    coords = np.concatenate([b, base], axis=1)
    # force duplicates
    k = int(n * dup_frac)
    coords[n - k:] = coords[rng.integers(0, n - k, size=k)]
    return coords


class TestUnique:
    def test_matches_numpy_unique(self, rng):
        n, cap = 512, 512
        coords = random_coords(rng, n)
        valid = rng.random(n) > 0.1
        res = unique_coords(jnp.asarray(coords), jnp.asarray(valid), cap)

        ref = np.unique(coords[valid], axis=0)
        got = np.asarray(res.coords)[np.asarray(res.valid)]
        assert int(res.num_unique) == len(ref)
        # our table is key-sorted == lexicographic in (b,x,y,z) given packing
        np.testing.assert_array_equal(np.sort(got.view("i4,i4,i4,i4"), axis=0),
                                      np.sort(ref.view("i4,i4,i4,i4"), axis=0))

    def test_inverse_roundtrip(self, rng):
        n, cap = 300, 300
        coords = random_coords(rng, n)
        valid = rng.random(n) > 0.2
        res = unique_coords(jnp.asarray(coords), jnp.asarray(valid), cap)
        inv = np.asarray(res.inverse)
        out = np.asarray(res.coords)
        for i in range(n):
            if valid[i]:
                assert inv[i] >= 0
                np.testing.assert_array_equal(out[inv[i]], coords[i])
            else:
                assert inv[i] == -1

    def test_capacity_overflow_drops(self, rng):
        n, cap = 256, 16
        coords = random_coords(rng, n, dup_frac=0.0, span=100)
        valid = np.ones(n, bool)
        res = unique_coords(jnp.asarray(coords), jnp.asarray(valid), cap)
        n_uniq_true = len(np.unique(coords, axis=0))
        assert int(res.num_unique) == n_uniq_true  # reported, even if > cap
        assert int(np.asarray(res.valid).sum()) == min(cap, n_uniq_true)
        inv = np.asarray(res.inverse)
        kept = inv >= 0
        # every kept point maps to its own coord
        out = np.asarray(res.coords)
        np.testing.assert_array_equal(out[inv[kept]], coords[kept])

    def test_all_invalid(self):
        coords = jnp.zeros((8, 4), jnp.int32)
        valid = jnp.zeros((8,), bool)
        res = unique_coords(coords, valid, 8)
        assert int(res.num_unique) == 0
        assert not bool(np.asarray(res.valid).any())
        assert (np.asarray(res.inverse) == -1).all()

    def test_jit_and_grad_safe(self, rng):
        # must be jittable with static cap
        coords = jnp.asarray(random_coords(rng, 64))
        valid = jnp.ones((64,), bool)
        f = jax.jit(lambda c, v: unique_coords(c, v, 64).num_unique)
        assert int(f(coords, valid)) >= 1


class TestLookup:
    def test_hits_and_misses(self, rng):
        n, cap = 400, 400
        coords = random_coords(rng, n, span=30)
        valid = np.ones(n, bool)
        res = unique_coords(jnp.asarray(coords), jnp.asarray(valid), cap)

        # queries: half present, half absent (span offset guarantees absence)
        q_present = coords[rng.integers(0, n, size=100)]
        q_absent = q_present.copy()
        q_absent[:, 1] += 1000
        q = np.concatenate([q_present, q_absent])
        idx = np.asarray(
            lookup_coords(res.keys, jnp.asarray(q), jnp.ones(len(q), bool))
        )
        out = np.asarray(res.coords)
        assert (idx[:100] >= 0).all()
        np.testing.assert_array_equal(out[idx[:100]], q_present)
        assert (idx[100:] == -1).all()

    def test_invalid_queries_miss(self, rng):
        coords = random_coords(rng, 64, span=10)
        res = unique_coords(jnp.asarray(coords), jnp.ones(64, bool), 64)
        idx = lookup_coords(res.keys, jnp.asarray(coords), jnp.zeros(64, bool))
        assert (np.asarray(idx) == -1).all()

    def test_negative_coords_invalid(self):
        coords = jnp.asarray([[0, -1, 2, 3]], jnp.int32)
        keys = make_keys(coords, jnp.ones(1, bool))
        assert int(keys.hi[0]) == INT32_MAX

    def test_single_entry_table(self):
        coords = jnp.asarray([[0, 5, 5, 5]], jnp.int32)
        res = unique_coords(coords, jnp.ones(1, bool), 4)
        q = jnp.asarray([[0, 5, 5, 5], [0, 5, 5, 6]], jnp.int32)
        idx = np.asarray(lookup_coords(res.keys, q, jnp.ones(2, bool)))
        assert idx[0] == 0 and idx[1] == -1
