"""Pallas k2/s2 up/down conv kernels vs the XLA strided/transposed convs
(which are dense-oracle tested in test_sparse_conv.py). Runs in pallas
interpret mode on CPU with shrunken BLK/WIN so multi-window covers and the
span=1 pair overlap path are exercised.

Reference hot path replaced: torchsparse gather-GEMM-scatter over the
downsample kernel maps (nn/functional/conv.py:122-205).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpcseg_tpu.ops.pallas_conv as pc
import openpcseg_tpu.ops.pallas_updown as pud
from openpcseg_tpu.core.geometry import build_pyramid
from openpcseg_tpu.ops import sparse_conv, unique_coords
from openpcseg_tpu.ops.sparse_conv import sparse_conv_up2


@pytest.fixture(autouse=True)
def small_kernel_config(monkeypatch):
    monkeypatch.setattr(pud, "INTERPRET", True)
    monkeypatch.setattr(pud, "BLK", 64)
    monkeypatch.setattr(pud, "WIN", 128)


def updown_scene(rng, span=12, n_batch=2, cin=8, n_active=150):
    """Two-level pyramid with the parity up/down maps + fine/coarse feats."""
    coords = []
    for b in range(n_batch):
        xyz = rng.integers(0, span, size=(n_active, 3))
        xyz = np.unique(xyz, axis=0)
        coords.append(
            np.concatenate([np.full((len(xyz), 1), b), xyz], axis=1))
    coords = np.concatenate(coords).astype(np.int32)
    n = len(coords)
    pyr = build_pyramid(jnp.asarray(coords), jnp.ones(n, bool), [n, n],
                        subm_kernel=None, updown_kernel=2)
    fine, coarse = pyr.levels[0], pyr.levels[1]
    assert fine.up_one_hot
    f_fine = np.zeros((n, cin), np.float32)
    f_fine[np.asarray(fine.valid)] = rng.normal(
        size=(int(np.asarray(fine.valid).sum()), cin)).astype(np.float32)
    f_coarse = np.zeros((n, cin), np.float32)
    f_coarse[np.asarray(coarse.valid)] = rng.normal(
        size=(int(np.asarray(coarse.valid).sum()), cin)).astype(np.float32)
    return (jnp.asarray(f_fine), jnp.asarray(f_coarse),
            coarse.down_kmap, fine.up_kmap, fine.valid, coarse.valid)


def test_pair_plan_structure(rng):
    """bit2 (both z slots) rows must be key-adjacent: r1 == r0 + 1."""
    _, _, dk, uk, _, _ = updown_scene(rng)
    dk_np = np.asarray(dk)
    n_both = 0
    for c in range(4):
        r0, r1 = dk_np[2 * c], dk_np[2 * c + 1]
        both = (r0 >= 0) & (r1 >= 0)
        n_both += int(both.sum())
        np.testing.assert_array_equal(r1[both], r0[both] + 1)
    assert n_both > 0, "scene exercises no z-adjacent pairs"
    plan = pud.build_pair_plan(dk, int(np.asarray(uk).shape[1]))
    assert not bool(plan["overflow"])
    plan_u = pud.build_parent_plan(uk, dk.shape[1])
    assert not bool(plan_u["overflow"])


def test_down_fwd_matches_xla(rng):
    f_fine, _, dk, uk, fvalid, cvalid = updown_scene(rng)
    W = jnp.asarray(rng.normal(size=(8, f_fine.shape[1], 12))
                    .astype(np.float32))
    ref = sparse_conv(f_fine, W, dk, cvalid, kmap_t=uk,
                      compute_dtype=jnp.float32)
    got = pud.pallas_conv_down2(f_fine, W, dk, cvalid, uk,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    assert np.abs(np.asarray(got)).max() > 0.1


def test_down_grads_match_xla(rng):
    f_fine, _, dk, uk, fvalid, cvalid = updown_scene(rng)
    W = jnp.asarray(rng.normal(size=(8, f_fine.shape[1], 12))
                    .astype(np.float32))

    def loss_ref(f, w):
        o = sparse_conv(f, w, dk, cvalid, kmap_t=uk,
                        compute_dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    def loss_pl(f, w):
        o = pud.pallas_conv_down2(f, w, dk, cvalid, uk,
                                  compute_dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    gr = jax.grad(loss_ref, argnums=(0, 1))(f_fine, W)
    gp = jax.grad(loss_pl, argnums=(0, 1))(f_fine, W)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=0.05, atol=0.05)
    assert np.abs(np.asarray(gp[1])).max() > 0.1


def test_up_fwd_matches_xla(rng):
    _, f_coarse, dk, uk, fvalid, cvalid = updown_scene(rng)
    W = jnp.asarray(rng.normal(size=(8, f_coarse.shape[1], 12))
                    .astype(np.float32))
    ref = sparse_conv_up2(f_coarse, W, uk, fvalid, dk,
                          compute_dtype=jnp.float32)
    got = pud.pallas_conv_up2(f_coarse, W, uk, fvalid, dk,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    assert np.abs(np.asarray(got)).max() > 0.1


def test_up_grads_match_xla(rng):
    _, f_coarse, dk, uk, fvalid, cvalid = updown_scene(rng)
    W = jnp.asarray(rng.normal(size=(8, f_coarse.shape[1], 12))
                    .astype(np.float32))

    def loss_ref(f, w):
        o = sparse_conv_up2(f, w, uk, fvalid, dk, compute_dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    def loss_pl(f, w):
        o = pud.pallas_conv_up2(f, w, uk, fvalid, dk,
                                compute_dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    gr = jax.grad(loss_ref, argnums=(0, 1))(f_coarse, W)
    gp = jax.grad(loss_pl, argnums=(0, 1))(f_coarse, W)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=0.05, atol=0.05)
    assert np.abs(np.asarray(gp[1])).max() > 0.1


def test_bf16_compute_dtype(rng):
    """bf16 compute path (the production configuration) stays close."""
    f_fine, _, dk, uk, fvalid, cvalid = updown_scene(rng)
    W = jnp.asarray(rng.normal(size=(8, f_fine.shape[1], 12))
                    .astype(np.float32))
    ref = sparse_conv(f_fine, W, dk, cvalid, kmap_t=uk,
                      compute_dtype=jnp.bfloat16)
    got = pud.pallas_conv_down2(f_fine, W, dk, cvalid, uk,
                                compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.1, atol=0.1)
