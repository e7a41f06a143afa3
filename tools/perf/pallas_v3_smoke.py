"""On-TPU smoke + parity for the v3 pallas conv: fwd then grads, small N
then bench-like N. Isolates runtime faults (DMA OOB, semaphore mismatch)
from the full training step."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openpcseg_tpu.ops import pallas_conv as pc
from openpcseg_tpu.ops.sparse_conv import window_subm_conv
from openpcseg_tpu.ops.kmap import build_subm_kmap, kernel_offsets
from openpcseg_tpu.ops.coords import unique_coords


def scene(rng, n_vox, cap, c, span=64):
    pts = rng.integers(0, span, size=(n_vox, 3)).astype(np.int32)
    coords = np.concatenate(
        [np.zeros((n_vox, 1), np.int32), pts], axis=1)
    u = unique_coords(jnp.asarray(coords),
                      jnp.ones(n_vox, bool), cap)
    kmap = build_subm_kmap(u.keys, u.coords, u.valid, 3)
    feats = jnp.asarray(
        rng.normal(size=(cap, c)).astype(np.float32))
    feats = jnp.where(u.valid[:, None], feats, 0.0)
    return feats, kmap, u.valid


def check(tag, rng, n_vox, cap, cin, cout):
    offs = kernel_offsets(3)
    feats, kmap, valid = scene(rng, n_vox, cap, cin)
    W = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))

    f_ref = jax.jit(lambda f, w: window_subm_conv(
        f, w, kmap, valid, offs, compute_dtype=jnp.bfloat16))
    f_got = jax.jit(lambda f, w: pc.pallas_window_subm_conv(
        f, w, kmap, valid, offs, compute_dtype=jnp.bfloat16))
    ref = np.asarray(jax.device_get(f_ref(feats, W)))
    got = np.asarray(jax.device_get(f_got(feats, W)))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    print(f"{tag} fwd: rel-max-err {err:.2e}", flush=True)
    assert err < 3e-2, err

    g_ref = jax.jit(jax.grad(lambda f, w: jnp.sum(window_subm_conv(
        f, w, kmap, valid, offs, compute_dtype=jnp.bfloat16) ** 2),
        argnums=(0, 1)))
    g_got = jax.jit(jax.grad(lambda f, w: jnp.sum(
        pc.pallas_window_subm_conv(
            f, w, kmap, valid, offs, compute_dtype=jnp.bfloat16) ** 2),
        argnums=(0, 1)))
    rf, rw = jax.device_get(g_ref(feats, W))
    gf, gw = jax.device_get(g_got(feats, W))
    ef = np.abs(np.asarray(gf) - np.asarray(rf)).max() / (
        np.abs(np.asarray(rf)).max() + 1e-6)
    ew = np.abs(np.asarray(gw) - np.asarray(rw)).max() / (
        np.abs(np.asarray(rw)).max() + 1e-6)
    print(f"{tag} bwd: dfeats rel {ef:.2e} dW rel {ew:.2e}", flush=True)
    assert ef < 5e-2 and ew < 5e-2, (ef, ew)


def main():
    rng = np.random.default_rng(0)
    check("small C32", rng, 3500, 4096, 32, 32)
    check("mid C96", rng, 3500, 4096, 96, 96)
    check("decoder C384", rng, 3500, 4096, 384, 256)
    check("big C32", rng, 80000, 98304, 32, 32)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
