"""sort_keys_blocked: the nearly-sorted two-pass block sort must equal a
full lexicographic sort UNCONDITIONALLY (the displacement bound is only a
fast path; adversarial inputs take the lax.cond full-sort fallback)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.ops.coords import (INT32_MAX, make_keys,
                                      sort_keys_blocked, unique_coords)


def _ref_sort(hi, lo, it):
    return jax.lax.sort((hi, lo, it), num_keys=2)


def _check(hi, lo, blk):
    it = jnp.arange(hi.shape[0], dtype=jnp.int32)
    got = sort_keys_blocked(jnp.asarray(hi), jnp.asarray(lo), it, blk)
    want = _ref_sort(jnp.asarray(hi), jnp.asarray(lo), it)
    for g, w, name in zip(got, want, ("hi", "lo", "perm")):
        # perm may differ between equal-key rows only where keys are
        # duplicated; compare the keyed view instead of raw perm
        if name == "perm":
            np.testing.assert_array_equal(
                np.asarray(hi)[np.asarray(g)], np.asarray(want[0]))
            np.testing.assert_array_equal(
                np.asarray(lo)[np.asarray(g)], np.asarray(want[1]))
        else:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _nearly_sorted(n, max_disp, rng, dup=False):
    base = np.sort(rng.integers(0, 1 << 20, size=n).astype(np.int64))
    if dup:
        base = np.repeat(base[: n // 2], 2)[:n]
    pos = np.argsort(np.arange(n) + rng.uniform(0, max_disp, n))
    shuffled = base[pos]
    hi = (shuffled >> 10).astype(np.int32)
    lo = (shuffled & 1023).astype(np.int32)
    return hi, lo


def test_within_bound_fast_path():
    rng = np.random.default_rng(0)
    hi, lo = _nearly_sorted(5000, max_disp=120, rng=rng)
    _check(hi, lo, blk=256)


def test_duplicates_within_bound():
    rng = np.random.default_rng(1)
    hi, lo = _nearly_sorted(5000, max_disp=100, rng=rng, dup=True)
    _check(hi, lo, blk=256)


def test_adversarial_falls_back():
    rng = np.random.default_rng(2)
    hi = rng.integers(0, 1 << 30, size=4000).astype(np.int32)
    lo = rng.integers(0, 1 << 30, size=4000).astype(np.int32)
    _check(hi, lo, blk=256)  # fully random: displacement >> blk/2


def test_n_not_multiple_of_block():
    rng = np.random.default_rng(3)
    hi, lo = _nearly_sorted(4999, max_disp=50, rng=rng)
    _check(hi, lo, blk=256)


def test_small_n_degenerates_to_full_sort():
    rng = np.random.default_rng(4)
    hi = rng.integers(0, 100, size=300).astype(np.int32)
    lo = rng.integers(0, 100, size=300).astype(np.int32)
    _check(hi, lo, blk=256)  # n <= 2*blk branch


def test_invalid_padding_keys_sort_last():
    rng = np.random.default_rng(5)
    hi, lo = _nearly_sorted(5000, max_disp=60, rng=rng)
    hi[rng.integers(0, 5000, 200)] = INT32_MAX
    _check(hi, lo, blk=256)


@pytest.mark.parametrize("blk", [0, 1024])
def test_unique_coords_downsample_equivalence(blk):
    """build_downsample with sort_block (the OPENPCSEG_BLOCKSORT path,
    threaded through engine/task.py geom_kw) must produce the identical
    unique table + inverse as the global-sort path on a sorted fine table
    (the real call pattern: parent keys of a key-sorted child table)."""
    from openpcseg_tpu.ops.kmap import build_downsample

    rng = np.random.default_rng(6)
    n, cap = 6000, 4096
    coords = np.stack([
        np.zeros(n, np.int32),
        rng.integers(0, 200, n).astype(np.int32),
        rng.integers(0, 200, n).astype(np.int32),
        rng.integers(0, 200, n).astype(np.int32),
    ], axis=1)
    valid = np.ones(n, bool)
    valid[5500:] = False
    fine = unique_coords(jnp.asarray(coords), jnp.asarray(valid), n)

    got = build_downsample(fine.coords, fine.valid, cap, stride=2,
                           sort_block=blk or None)
    want = build_downsample(fine.coords, fine.valid, cap, stride=2)

    np.testing.assert_array_equal(np.asarray(got.coords),
                                  np.asarray(want.coords))
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.inverse),
                                  np.asarray(want.inverse))
    assert int(got.num_unique) == int(want.num_unique)


@pytest.mark.slow  # opt-in flag (default off — lost the r5 TPU A/B)
def test_env_flag_wires_through_preprocess(monkeypatch):
    """OPENPCSEG_BLOCKSORT must reach the pyramid build via task.preprocess
    and leave every level's tables unchanged (flat path only; the per-scan
    vmap path intentionally ignores the flag — see build_downsample)."""
    import jax.numpy as jnp

    from openpcseg_tpu.config import CfgDict
    from openpcseg_tpu.data import synthetic_batch
    from openpcseg_tpu.engine import SegTask

    cfgs = CfgDict({
        "DATA": {"DATASET": "semantickitti", "VOXEL_SIZE": 0.2},
        "MODEL": {"NAME": "MinkUNet", "IGNORE_LABEL": 0,
                  "IN_FEATURE_DIM": 4, "BLOCK": "ResBlock",
                  "NUM_LAYER": [1] * 8, "PLANES": [8] * 9, "cr": 1.0,
                  "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.0},
        "OPTIM": {"BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1,
                  "OPTIMIZER": "sgd", "LR_PER_SAMPLE": 0.01,
                  "WEIGHT_DECAY": 0.0, "MOMENTUM": 0.9, "NESTEROV": True,
                  "GRAD_NORM_CLIP": 10,
                  "SCHEDULER": "linear_warmup_with_cosdecay",
                  "WARMUP_EPOCH": 1},
        "TPU": {"VOXEL_CAP_PER_SCAN": 2048,
                "VOXEL_CAP_RATIOS": [1.0, 0.8, 0.5, 0.3, 0.2]},
    })
    task = SegTask(cfgs, 20, batch_per_device=1, iters_per_epoch=5)
    b = {k: jnp.asarray(v) for k, v in
         synthetic_batch(0, 1, n_points=1500).items()}

    monkeypatch.setenv("OPENPCSEG_BLOCKSORT", "256")
    _, pyr_blk = task.preprocess(b)
    monkeypatch.setenv("OPENPCSEG_BLOCKSORT", "0")
    _, pyr_ref = task.preprocess(b)
    for la, lb in zip(pyr_blk.levels, pyr_ref.levels):
        np.testing.assert_array_equal(np.asarray(la.keys.hi),
                                      np.asarray(lb.keys.hi))
        np.testing.assert_array_equal(np.asarray(la.keys.lo),
                                      np.asarray(lb.keys.lo))
        np.testing.assert_array_equal(np.asarray(la.subm_kmap),
                                      np.asarray(lb.subm_kmap))


def test_make_keys_roundtrip_guard():
    # blocked path must not disturb make_keys' invalid-lane convention
    coords = jnp.asarray([[0, 1, 2, 3], [0, -1, 2, 3]], jnp.int32)
    k = make_keys(coords, jnp.asarray([True, True]))
    assert int(k.hi[1]) == INT32_MAX
