"""Oracle tests for the pallas devoxelize kernels (interpret mode): the
window one-hot forward/backward must match the XLA gather / autodiff
scatter at the chosen compute dtype's precision."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpcseg_tpu.ops.pallas_devox as pd
from openpcseg_tpu.ops.voxelize import _devox_apply


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pd, "INTERPRET", True)
    # small windows/blocks so multi-window coverage and padding trigger
    monkeypatch.setattr(pd, "BLK", 16)
    monkeypatch.setattr(pd, "WIN", 16)
    monkeypatch.setattr(pd, "NW", 8)
    monkeypatch.setattr(pd, "NWT", 32)
    monkeypatch.setattr(pd, "VBLK", 8)
    monkeypatch.setattr(pd, "DWIN", 128)
    monkeypatch.setattr(pd, "DNWT", 64)


def _mk(rng, n, v, c, miss_frac=0.15):
    """Synthetic devox tables honoring the production invariants: per
    (cx, cy) column the base rows are (near-)monotone over points and a
    column's z / z+1 corners sit on adjacent voxel rows."""
    idx = np.full((8, n), -1, np.int32)
    for j in range(4):
        base = np.sort(rng.integers(0, v - 1, n).astype(np.int32))
        h0 = rng.random(n) >= miss_frac
        h1 = rng.random(n) >= miss_frac
        iz0 = np.where(h0, base, -1)
        iz1 = np.where(h1, base + 1, -1)
        idx[2 * j] = iz0
        idx[2 * j + 1] = iz1
    w = rng.random((8, n)).astype(np.float32)
    w[idx < 0] = 0.0
    vf = rng.normal(size=(v, c)).astype(np.float32)
    return jnp.asarray(vf), jnp.asarray(idx), jnp.asarray(w)


def test_fold_corner_columns(rng):
    vf, idx, w = _mk(rng, 64, 40, 8)
    base, a1, a2, hit, adj_bad = jax.jit(pd.fold_corner_columns)(idx, w)
    assert not bool(adj_bad)
    # reconstruct the gather from the folded form and compare
    safe = jnp.maximum(base, 0)
    got = (vf[safe] * a1[..., None] + vf[jnp.minimum(safe + 1, 39)]
           * a2[..., None]).sum(0)
    want = _devox_apply(vf, idx, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,v,c", [(100, 40, 16), (200, 70, 96)])
def test_forward_matches_gather(rng, n, v, c):
    vf, idx, w = _mk(rng, n, v, c)
    got = jax.jit(lambda vf: pd.pallas_devoxelize(
        vf, idx, w, compute_dtype=jnp.float32))(vf)
    want = _devox_apply(vf, idx, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,v,c", [(100, 40, 16), (200, 70, 96)])
def test_backward_matches_autodiff(rng, n, v, c):
    vf, idx, w = _mk(rng, n, v, c)
    dout = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))

    def loss(vf, impl):
        out = impl(vf)
        return jnp.vdot(out.astype(jnp.float32), dout)

    got = jax.grad(lambda vf: loss(vf, lambda x: pd.pallas_devoxelize(
        x, idx, w, compute_dtype=jnp.float32)))(vf)
    want = jax.grad(lambda vf: loss(vf, lambda x: _devox_apply(
        x, idx, w)))(vf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_overflow_falls_back(rng):
    """Shuffled (non-monotone) bases overflow the window cover; the cond
    must route to the XLA path and still produce exact results."""
    n, v, c = 128, 600, 8
    vf, idx, w = _mk(rng, n, v, c)
    perm = rng.permutation(n)
    idx = idx[:, perm]
    w = w[:, perm]
    # wide random bases: spread >> NW * WIN forces cover overflow
    idx = jnp.asarray(np.where(
        np.asarray(idx) >= 0,
        rng.integers(0, v - 1, (8, n)).astype(np.int32), -1))
    base, a1, a2, hit, adj_bad = pd.fold_corner_columns(idx, w)
    got = jax.jit(lambda vf: pd.pallas_devoxelize(
        vf, idx, w, compute_dtype=jnp.float32))(vf)
    want = _devox_apply(vf, idx, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_compute_dtype_close(rng):
    """Default bf16 staging: features round through bf16 (weights stay
    f32 in the forward), so parity holds at bf16 feature precision."""
    n, v, c = 100, 40, 16
    vf, idx, w = _mk(rng, n, v, c)
    got = jax.jit(lambda vf: pd.pallas_devoxelize(vf, idx, w))(vf)
    want = _devox_apply(vf.astype(jnp.bfloat16).astype(jnp.float32),
                        idx, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_bf16_primal_dual_consumer_grad(rng):
    """Regression (round-4 TPU crash): a bf16 voxel table consumed by BOTH
    the devox kernel and a residual path gets two cotangent contributions;
    ad.add_tangents asserts they typematch, so the custom-vjp backward must
    return the cotangent in the primal dtype (was: f32 vs bf16 assert at
    [37376, 128] in the MinkUNet bench)."""
    n, v, c = 100, 40, 16
    vf, idx, w = _mk(rng, n, v, c)
    vf16 = vf.astype(jnp.bfloat16)

    def loss(vf):
        pts = pd.pallas_devoxelize(vf, idx, w)        # consumer 1
        resid = vf.astype(jnp.float32).sum()          # consumer 2 (bf16 ct)
        return pts.astype(jnp.float32).sum() + resid

    g = jax.jit(jax.grad(loss))(vf16)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
