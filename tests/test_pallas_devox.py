"""Oracle tests for the pallas devoxelize-transpose kernel (interpret
mode): the weighted one-hot MXU transpose must match the autodiff
scatter-add at the compute dtype's own precision."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpcseg_tpu.ops.pallas_devox as pd
from openpcseg_tpu.ops.voxelize import (
    _devox_apply,
    devox_transpose_bounds,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pd, "INTERPRET", True)
    # small windows/blocks so multi-window spans and padding both trigger
    monkeypatch.setattr(pd, "VBLK", 8)
    monkeypatch.setattr(pd, "DWIN", 32)
    monkeypatch.setattr(pd, "DNWT", 64)


def _mk(rng, n, v, c, miss_frac=0.1):
    """Sorted synthetic devox tables: idx[k] monotone over points (the real
    geometry guarantees this: sorted keys + constant corner offsets)."""
    idx = np.zeros((8, n), np.int32)
    for k in range(8):
        col = np.sort(rng.integers(0, v, n).astype(np.int32))
        m = rng.random(n) < miss_frac
        col[m] = -1
        # keep monotone over the HIT rows only (misses anywhere)
        hit = col >= 0
        col[hit] = np.sort(col[hit])
        idx[k] = col
    w = rng.random((8, n)).astype(np.float32)
    w[idx < 0] = 0.0
    dout = rng.normal(size=(n, c)).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(w), jnp.asarray(dout)


def _oracle(dout, idx, w, v):
    """Autodiff transpose at the forward's own precision (bf16 weights)."""
    vf = jnp.zeros((v, dout.shape[1]), jnp.bfloat16)

    def f(vf):
        return jnp.vdot(_devox_apply(vf, idx, w).astype(jnp.float32),
                        dout.astype(jnp.float32))

    return jax.grad(f)(vf).astype(jnp.float32)


@pytest.mark.parametrize("n,v,c", [(200, 40, 16), (333, 50, 96)])
def test_matches_autodiff(rng, n, v, c):
    idx, w, dout = _mk(rng, n, v, c)
    lo, hi = devox_transpose_bounds(idx, v)
    got = pd.devox_transpose_pallas(dout, idx, w, lo, hi, v)
    want = _oracle(dout, idx, w, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=6e-2)


def test_empty_and_dense_voxels(rng):
    # some voxels with zero contributors, others with many
    n, v, c = 256, 10, 8
    idx = jnp.asarray(np.stack([
        np.sort(np.where(np.arange(n) % 3 == 0, -1,
                         (np.arange(n) * 7 // n) % v)).astype(np.int32)
        for _ in range(8)]))
    w = jnp.asarray(np.where(np.asarray(idx) >= 0, 0.5, 0.0
                             ).astype(np.float32))
    dout = jnp.asarray(np.ones((n, c), np.float32))
    lo, hi = devox_transpose_bounds(idx, v)
    got = pd.devox_transpose_pallas(dout, idx, w, lo, hi, v)
    want = _oracle(dout, idx, w, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=6e-2)


def test_wired_into_devox_vjp(rng, monkeypatch):
    """OPENPCSEG_DEVOX_PALLAS=1 routes the devoxelize custom VJP through
    the kernel (and the geometry pass computes lo/hi bounds)."""
    from openpcseg_tpu.core.geometry import _devox_scatterfree
    from openpcseg_tpu.ops.voxelize import devoxelize_trilinear

    monkeypatch.setenv("OPENPCSEG_DEVOX_PALLAS", "1")
    assert pd.use_pallas_devox() and _devox_scatterfree()

    n, v, c = 128, 30, 16
    idx, w, dout = _mk(rng, n, v, c)
    lo, hi = devox_transpose_bounds(idx, v)
    vf = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32))

    def loss(vf):
        return jnp.vdot(devoxelize_trilinear(
            vf.astype(jnp.bfloat16), idx, w, lo, hi).astype(jnp.float32),
            dout)

    got = jax.grad(loss)(vf)
    want = _oracle(dout, idx, w, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=6e-2)
