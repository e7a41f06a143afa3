"""StackedBlocks (nn.scan over repeated residual blocks, models/layers.py)
must be numerically identical to the unrolled loop when the per-iteration
parameter slices are transplanted into a plain block. Guards the round-4
compile-time refactor (one compiled scan body instead of n unrolled block
copies in the train-step HLO)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.models.layers import (ResidualBlock, Bottleneck,
                                         StackedBlocks, repeated_blocks)
from openpcseg_tpu.ops.kmap import kernel_offsets


def _mk_inputs(rng, n=64, c=16, k=27):
    feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    # self-map on a permuted neighborhood with ~20% misses
    kmap = rng.integers(0, n, (k, n)).astype(np.int32)
    kmap[rng.random((k, n)) < 0.2] = -1
    kmap[k // 2] = np.arange(n, dtype=np.int32)  # identity center row
    valid = jnp.asarray(rng.random(n) < 0.9)
    return feats, jnp.asarray(kmap), valid


@pytest.mark.parametrize("block_cls", [ResidualBlock, Bottleneck])
def test_matches_unrolled_transplant(rng, block_cls):
    feats, kmap, valid = _mk_inputs(rng)
    c = feats.shape[1] * (4 if block_cls is Bottleneck else 1)
    n_rep = 3
    stacked = StackedBlocks(block_cls, feats.shape[1], n_rep,
                            compute_dtype=jnp.float32)
    x0 = jnp.pad(feats, ((0, 0), (0, c - feats.shape[1])))  # identity path
    vs = stacked.init(jax.random.PRNGKey(0), x0, kmap, valid, False)

    y = stacked.apply(vs, x0, kmap, valid, False)

    blk = block_cls(feats.shape[1], compute_dtype=jnp.float32)
    x = x0
    for i in range(n_rep):
        sl = jax.tree.map(lambda a: a[i], vs)
        x = blk.apply(
            {"params": sl["params"]["Scan_ScanBody_0"][f"{block_cls.__name__}_0"],
             "batch_stats":
                 sl["batch_stats"]["Scan_ScanBody_0"][f"{block_cls.__name__}_0"]},
            x, kmap, valid, False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_batch_stats_update_per_iteration(rng):
    """Train mode must update each stacked block's running stats from its
    OWN activations (axis-0 stacked), exactly like the unrolled loop."""
    feats, kmap, valid = _mk_inputs(rng)
    stacked = StackedBlocks(ResidualBlock, feats.shape[1], 2,
                            compute_dtype=jnp.float32)
    vs = stacked.init(jax.random.PRNGKey(1), feats, kmap, valid, False)
    _, mut = stacked.apply(vs, feats, kmap, valid, True,
                           mutable=["batch_stats"])
    new = mut["batch_stats"]["Scan_ScanBody_0"]["ResidualBlock_0"]
    old = vs["batch_stats"]["Scan_ScanBody_0"]["ResidualBlock_0"]
    m_new = new["MaskedBatchNorm_0"]["mean"]
    m_old = old["MaskedBatchNorm_0"]["mean"]
    assert m_new.shape == m_old.shape and m_new.shape[0] == 2
    # both iterations' stats moved, and differently (different activations)
    assert not np.allclose(np.asarray(m_new[0]), np.asarray(m_old[0]))
    assert not np.allclose(np.asarray(m_new[1]), np.asarray(m_old[1]))
    assert not np.allclose(np.asarray(m_new[0]), np.asarray(m_new[1]))


def test_repeated_blocks_env_escape(rng, monkeypatch):
    """OPENPCSEG_SCAN_BLOCKS=0 restores full unrolling (no StackedBlocks in
    the param tree); default uses the scan for n >= 3."""
    import flax.linen as nn

    feats, kmap, valid = _mk_inputs(rng)

    class Host(nn.Module):
        @nn.compact
        def __call__(self, x):
            return repeated_blocks(ResidualBlock, x.shape[1], 3, None,
                                   jnp.float32, x, kmap, valid, False)

    monkeypatch.setenv("OPENPCSEG_SCAN_BLOCKS", "0")
    v0 = Host().init(jax.random.PRNGKey(0), feats)
    assert "StackedBlocks_0" not in v0["params"]
    assert "ResidualBlock_2" in v0["params"]
    y0 = Host().apply(v0, feats)
    assert bool(jnp.isfinite(y0).all())

    monkeypatch.delenv("OPENPCSEG_SCAN_BLOCKS")
    v1 = Host().init(jax.random.PRNGKey(0), feats)
    assert "StackedBlocks_0" in v1["params"]
