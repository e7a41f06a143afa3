"""Per-scan table mode (batch > 1) must be semantically identical to the
round-4 batch-summed tables: same loss, same voxel counts, same eval
confusion matrix — only the table layout (per-scan cap slices) changes.
Fixes the measured ~8%/18% super-linear per-scan cost at batch 2/4
(BASELINE.md round-4 BENCH_DUP sweep).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data import synthetic_batch
from openpcseg_tpu.engine import SegTask

# Per-scan tables are an opt-in (OPENPCSEG_PER_SCAN=1, default off — lost
# the r5 TPU A/B); equivalence tests live in the slow tier.
pytestmark = pytest.mark.slow

NUM_CLASS = 20


def tiny_cfgs(model="MinkUNet"):
    cfg = {
        "DATA": {"DATASET": "semantickitti", "VOXEL_SIZE": 0.2},
        "MODEL": {
            "NAME": model, "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 4,
            "BLOCK": "ResBlock", "NUM_LAYER": [1, 1, 1, 1, 1, 1, 1, 1],
            "PLANES": [8, 8, 16, 16, 16, 16, 16, 8, 8],
            "cr": 1.0, "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.0,
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 4, "OPTIMIZER": "adam",
            "LR_PER_SAMPLE": 0.002, "WEIGHT_DECAY": 0.0001,
            "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 4096,
                "VOXEL_CAP_RATIOS": [1.0, 1.0, 0.9, 0.7, 0.5]},
    }
    return CfgDict(cfg)


def make_batch(seed, batch=2, n_pts=3000):
    b = synthetic_batch(seed, batch, n_points=n_pts, num_class=NUM_CLASS)
    return {k: jnp.asarray(v) for k, v in b.items()}


def _run_steps(monkeypatch, flag):
    monkeypatch.setenv("OPENPCSEG_PER_SCAN", flag)
    task = SegTask(tiny_cfgs(), NUM_CLASS, batch_per_device=2,
                   iters_per_epoch=30, total_epochs=4)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, make_batch(0))
    step = jax.jit(task.train_step)
    losses = []
    for i in range(3):
        state, m = step(state, make_batch(i), rng)
        losses.append(float(m["loss"]))
    ev = jax.jit(task.eval_step)(state, make_batch(7))
    return losses, int(m["num_voxels"]), np.asarray(ev["hist"])


@pytest.mark.slow
def test_per_scan_matches_batch_summed(monkeypatch):
    l1, n1, h1 = _run_steps(monkeypatch, "1")
    l0, n0, h0 = _run_steps(monkeypatch, "0")
    assert n1 == n0
    np.testing.assert_allclose(l1, l0, rtol=2e-4, atol=2e-4)
    # same params/data -> identical predictions -> identical histograms
    np.testing.assert_allclose(h1, h0, rtol=0, atol=h0.sum() * 5e-5 + 2)


def test_per_scan_preprocess_layout(monkeypatch):
    monkeypatch.setenv("OPENPCSEG_PER_SCAN", "1")
    task = SegTask(tiny_cfgs(), NUM_CLASS, batch_per_device=2,
                   iters_per_epoch=30, total_epochs=4)
    batch = make_batch(1)
    vb, pyr = jax.jit(task.preprocess)(batch)
    caps = task.caps_per_scan
    b = 2
    assert vb.voxel_coords.shape[0] == b * caps[0]
    assert pyr.level_counts.shape == (b, len(caps))
    # scan slices hold only their own batch index
    vc = np.asarray(vb.voxel_coords)
    vv = np.asarray(vb.voxel_valid)
    for s in range(b):
        sl = vc[s * caps[0]:(s + 1) * caps[0], 0][
            vv[s * caps[0]:(s + 1) * caps[0]]]
        assert (sl == s).all()
    # kernel maps point inside the right level slices
    for l, lvl in enumerate(pyr.levels):
        km = np.asarray(lvl.subm_kmap)
        assert km.shape[1] == b * caps[l]
        hit = km >= 0
        owner = np.broadcast_to(
            np.arange(b).repeat(caps[l])[None, :], km.shape)
        assert (km[hit] // caps[l] == owner[hit]).all()


@pytest.mark.slow
def test_per_scan_cylinder_smoke(monkeypatch):
    monkeypatch.setenv("OPENPCSEG_PER_SCAN", "1")
    cfg = CfgDict({
        "MODALITY": "cylinder",
        "DATA": {
            "DATASET": "semantickitti",
            "CYLINDER_GRID_SIZE": [120, 90, 16],
            "CYLINDER_SPACE_MAX": [50, 180, 2],
            "CYLINDER_SPACE_MIN": [0, -180, -4],
        },
        "MODEL": {
            "NAME": "Cylinder_TS", "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 9,
            "INIT_SIZE": 8, "POINT_REFINEMENT": True,
            "LABEL_SMOOTHING": 0.0, "DROPOUT_P": 0.0,
        },
        "OPTIM": tiny_cfgs().OPTIM,
        "TPU": {"VOXEL_CAP_PER_SCAN": 3072,
                "VOXEL_CAP_RATIOS": [1.0, 1.0, 0.9, 0.7, 0.5]},
    })
    task = SegTask(cfg, NUM_CLASS, batch_per_device=2,
                   iters_per_epoch=30, total_epochs=4)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, make_batch(0))
    step = jax.jit(task.train_step)
    state, m = step(state, make_batch(0), rng)
    assert np.isfinite(float(m["loss"]))
