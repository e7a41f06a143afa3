"""Pallas window conv vs the XLA window conv (which is itself dense-oracle
tested in test_sparse_conv.py). Runs in pallas interpret mode on CPU with
shrunken BLK/WIN so multi-window splits are exercised.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpcseg_tpu.ops.pallas_conv as pc
from openpcseg_tpu.ops import (
    build_subm_kmap,
    kernel_offsets,
    unique_coords,
)
from openpcseg_tpu.ops.sparse_conv import window_subm_conv


@pytest.fixture(autouse=True)
def small_kernel_config(monkeypatch):
    monkeypatch.setattr(pc, "INTERPRET", True)
    monkeypatch.setattr(pc, "BLK", 64)
    monkeypatch.setattr(pc, "WIN", 128)
    monkeypatch.setattr(pc, "NW", 4)


def scene(rng, span=10, n_batch=2, cin=8, n_active=120, cap=640):
    coords = []
    for b in range(n_batch):
        xyz = rng.integers(0, span, size=(n_active, 3))
        xyz = np.unique(xyz, axis=0)
        coords.append(
            np.concatenate([np.full((len(xyz), 1), b), xyz], axis=1))
    coords = np.concatenate(coords).astype(np.int32)
    n = len(coords)
    assert n <= cap
    pcrd = np.full((cap, 4), -1, np.int32)
    pcrd[:n] = coords
    valid = np.zeros(cap, bool)
    valid[:n] = True
    res = unique_coords(jnp.asarray(pcrd), jnp.asarray(valid), cap)
    feats = np.zeros((cap, cin), np.float32)
    feats[np.asarray(res.valid)] = rng.normal(
        size=(int(np.asarray(res.valid).sum()), cin)).astype(np.float32)
    kmap = build_subm_kmap(res.keys, res.coords, res.valid, 3)
    return jnp.asarray(feats), kmap, res.valid


def test_forward_matches_window_conv(rng):
    feats, kmap, valid = scene(rng)
    offs = kernel_offsets(3)
    W = jnp.asarray(
        rng.normal(size=(27, feats.shape[1], 12)).astype(np.float32))

    ref = window_subm_conv(feats, W, kmap, valid, offs,
                           compute_dtype=jnp.float32)
    got = pc.pallas_window_subm_conv(feats, W, kmap, valid, offs,
                                     compute_dtype=jnp.float32)
    # kernel computes in bf16 -> compare with bf16-grade tolerance
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.05)
    # and it must not be all zeros / falling back silently
    assert np.abs(np.asarray(got)).max() > 0.1


def test_plan_no_overflow_on_scene(rng):
    feats, kmap, valid = scene(rng)
    plan = pc.build_window_plan(kmap, pc._plan_key(kernel_offsets(3)))
    assert not bool(plan["overflow"])
    assert int(plan["wcnt"].max()) >= 1


def test_grads_match_window_conv(rng):
    feats, kmap, valid = scene(rng)
    offs = kernel_offsets(3)
    W = jnp.asarray(
        rng.normal(size=(27, feats.shape[1], 12)).astype(np.float32))

    def loss_ref(f, w):
        o = window_subm_conv(f, w, kmap, valid, offs,
                             compute_dtype=jnp.float32)
        return jnp.sum(jnp.sin(o))

    def loss_pal(f, w):
        o = pc.pallas_window_subm_conv(f, w, kmap, valid, offs,
                                       compute_dtype=jnp.float32)
        return jnp.sum(jnp.sin(o))

    gr = jax.grad(loss_ref, argnums=(0, 1))(feats, W)
    gp = jax.grad(loss_pal, argnums=(0, 1))(feats, W)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gr[0]), rtol=0.06, atol=0.06)
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1]), rtol=0.06, atol=0.06)


def test_overflow_falls_back_exactly(rng, monkeypatch):
    # shrink windows so the scene overflows -> must take the XLA branch and
    # match the reference to f32 precision
    monkeypatch.setattr(pc, "WIN", 16)
    monkeypatch.setattr(pc, "NW", 2)
    feats, kmap, valid = scene(rng)
    offs = kernel_offsets(3)
    plan = pc.build_window_plan(kmap, pc._plan_key(offs))
    assert bool(plan["overflow"])
    W = jnp.asarray(
        rng.normal(size=(27, feats.shape[1], 12)).astype(np.float32))
    ref = window_subm_conv(feats, W, kmap, valid, offs,
                           compute_dtype=jnp.float32)
    got = pc.pallas_window_subm_conv(feats, W, kmap, valid, offs,
                                     compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wide_channels_single_kernel(rng):
    # v3 DMA-window kernel handles wide channels WITHOUT the round-2
    # recursive channel split (whose C=96 scoped-VMEM OOM motivated the
    # HBM-staged w3 design): fwd + grads parity at Cin=96, Cout=96
    feats, kmap, valid = scene(rng)
    n = feats.shape[0]
    feats96 = jnp.concatenate([feats] * (96 // feats.shape[1] + 1),
                              axis=1)[:, :96]
    offs = kernel_offsets(3)
    W = jnp.asarray(rng.normal(size=(27, 96, 96)).astype(np.float32))

    def loss_ref(f, w):
        return jnp.sum(window_subm_conv(f, w, kmap, valid, offs,
                                        compute_dtype=jnp.float32) ** 2)

    def loss_got(f, w):
        return jnp.sum(pc.pallas_window_subm_conv(
            f, w, kmap, valid, offs, compute_dtype=jnp.float32) ** 2)

    ref, (gr_f, gr_w) = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        feats96, W)
    got, (gg_f, gg_w) = jax.value_and_grad(loss_got, argnums=(0, 1))(
        feats96, W)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_f), np.asarray(gr_f),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gg_w), np.asarray(gr_w),
                               rtol=1e-3, atol=1e-3)


def test_size_policy_vmem_clamp(monkeypatch):
    """The auto ladder doubles (BLK, WIN) only when the backward kernel's
    scratch fits the scoped-VMEM budget; wide channels fall back."""
    monkeypatch.setattr(pc, "BLK", 512)
    monkeypatch.setattr(pc, "WIN", 512)
    monkeypatch.setenv("OPENPCSEG_PALLAS_POLICY", "auto")
    # narrow channels: 2x sizes fit the 32 MB budget
    assert pc._size_policy(8, 32, 32) == (1024, 1024)
    # decoder-wide channels: dW accumulator + staged windows exceed it
    blk, win = pc._size_policy(8, 384, 256)
    assert (blk, win) == (512, 512)
    # off pins the module defaults regardless of channels
    monkeypatch.setenv("OPENPCSEG_PALLAS_POLICY", "off")
    assert pc._size_policy(8, 32, 32) == (512, 512)
    # explicit ladder entries below the module floor are rejected
    monkeypatch.setenv("OPENPCSEG_PALLAS_POLICY", "256:256")
    assert pc._size_policy(8, 32, 32) == (512, 512)


@pytest.mark.slow  # GSIZE>1 is an opt-in (default 1 — lost the r5 TPU A/B)
def test_grouped_windows_fwd_bwd_parity(rng, monkeypatch):
    # GSIZE=3: the three same-dx columns share one window cover + DMA
    monkeypatch.setattr(pc, "GSIZE", 3)
    feats, kmap, valid = scene(rng)
    offs = kernel_offsets(3)
    W = jnp.asarray(
        rng.normal(size=(27, feats.shape[1], 12)).astype(np.float32))
    plan = pc.build_window_plan(kmap, pc._plan_key(offs))
    assert plan["gsize"] == 3 and not bool(plan["overflow"])

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


@pytest.mark.slow  # GSIZE>1 is an opt-in (default 1 — lost the r5 TPU A/B)
def test_grouped_windows_overflow_fallback(rng, monkeypatch):
    # grouped cover must still detect overflow and fall back exactly
    monkeypatch.setattr(pc, "GSIZE", 3)
    monkeypatch.setattr(pc, "WIN", 16)
    monkeypatch.setattr(pc, "NW", 2)
    feats, kmap, valid = scene(rng)
    offs = kernel_offsets(3)
    plan = pc.build_window_plan(kmap, pc._plan_key(offs))
    assert bool(plan["overflow"])
    W = jnp.asarray(
        rng.normal(size=(27, feats.shape[1], 12)).astype(np.float32))
    ref = window_subm_conv(feats, W, kmap, valid, offs,
                           compute_dtype=jnp.float32)
    got = pc.pallas_window_subm_conv(feats, W, kmap, valid, offs,
                                     compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
