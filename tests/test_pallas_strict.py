"""Strict (cond-free) pallas mode: parity when plans cover, NaN poison on
overflow. Strict mode removes the per-conv lax.cond fallback (a TPU
pipeline sync, ~22 ms/step at mk34 scale) and instead poisons the output
with NaN if a plan ever overflows, so training fails loudly that step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpcseg_tpu.ops.pallas_conv as pc

# Strict mode is a diagnostic opt-in (default off — lost the r5 TPU A/B);
# its parity/poison tests live in the slow tier.
pytestmark = pytest.mark.slow
from openpcseg_tpu.ops import kernel_offsets
from openpcseg_tpu.ops.sparse_conv import window_subm_conv

from test_pallas_conv import scene  # noqa: F401 (reuses rng fixture via conftest)


@pytest.fixture(autouse=True)
def strict_config(monkeypatch):
    monkeypatch.setattr(pc, "INTERPRET", True)
    monkeypatch.setattr(pc, "BLK", 64)
    monkeypatch.setattr(pc, "WIN", 128)
    monkeypatch.setattr(pc, "NW", 4)
    monkeypatch.setenv("OPENPCSEG_PALLAS_STRICT", "1")


def test_strict_fwd_and_grads_match(rng):
    feats, kmap, valid = scene(rng)
    offs = kernel_offsets(3)
    W = jnp.asarray(
        rng.normal(size=(27, feats.shape[1], 12)).astype(np.float32))

    def loss_ref(f, w):
        return jnp.sum(jnp.sin(window_subm_conv(
            f, w, kmap, valid, offs, compute_dtype=jnp.float32)))

    def loss_pal(f, w):
        return jnp.sum(jnp.sin(pc.pallas_window_subm_conv(
            f, w, kmap, valid, offs, compute_dtype=jnp.float32)))

    ref, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(feats, W)
    got, gp = jax.value_and_grad(loss_pal, argnums=(0, 1))(feats, W)
    np.testing.assert_allclose(float(got), float(ref), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=0.06, atol=0.06)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=0.06, atol=0.06)


def test_strict_overflow_poisons_nan(rng, monkeypatch):
    monkeypatch.setattr(pc, "WIN", 16)
    monkeypatch.setattr(pc, "NW", 2)
    feats, kmap, valid = scene(rng)
    offs = kernel_offsets(3)
    plan = pc.build_window_plan(kmap, pc._plan_key(offs))
    assert bool(plan["overflow"])
    W = jnp.asarray(
        rng.normal(size=(27, feats.shape[1], 12)).astype(np.float32))
    out = pc.pallas_window_subm_conv(feats, W, kmap, valid, offs,
                                     compute_dtype=jnp.float32)
    assert bool(jnp.any(jnp.isnan(out)))
    # gradients poison too
    g = jax.grad(lambda f: jnp.sum(pc.pallas_window_subm_conv(
        f, W, kmap, valid, offs, compute_dtype=jnp.float32)))(feats)
    assert bool(jnp.any(jnp.isnan(g)))


def test_strict_devox_parity(rng, monkeypatch):
    import openpcseg_tpu.ops.pallas_devox as pd
    from openpcseg_tpu.ops.voxelize import _devox_apply

    monkeypatch.setattr(pd, "INTERPRET", True)
    monkeypatch.setattr(pd, "BLK", 16)
    monkeypatch.setattr(pd, "WIN", 16)
    monkeypatch.setattr(pd, "NW", 8)
    monkeypatch.setattr(pd, "NWT", 32)
    monkeypatch.setattr(pd, "VBLK", 8)
    monkeypatch.setattr(pd, "DWIN", 128)
    monkeypatch.setattr(pd, "DNWT", 64)

    # key-sorted-ish monotone corner rows with z-adjacent pairs
    n, v, c = 96, 64, 8
    base = np.sort(rng.integers(0, v - 2, size=n)).astype(np.int32)
    idx = np.full((8, n), -1, np.int32)
    for k in range(4):
        idx[2 * k] = np.minimum(base + k, v - 2)
        idx[2 * k + 1] = idx[2 * k] + 1
    w = rng.random(size=(8, n)).astype(np.float32)
    feats = rng.normal(size=(v, c)).astype(np.float32)
    ref = _devox_apply(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
    got = pd.pallas_devoxelize(jnp.asarray(feats), jnp.asarray(idx),
                               jnp.asarray(w), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    # grads flow through the strict backward kernel too
    g = jax.grad(lambda f: jnp.sum(pd.pallas_devoxelize(
        f, jnp.asarray(idx), jnp.asarray(w),
        compute_dtype=jnp.float32) ** 2))(jnp.asarray(feats))
    gr = jax.grad(lambda f: jnp.sum(_devox_apply(
        f, jnp.asarray(idx), jnp.asarray(w)) ** 2))(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=0.05, atol=0.05)
