"""E2E smoke tests for SPVCNN and Cylinder3D (tiny, hermetic, CPU).

One jitted train step must run and produce a finite decreasing-ish loss,
and the eval step must produce a full-coverage confusion matrix — same
harness as test_minkunet_e2e but cheaper (fewer steps, smaller scenes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data import synthetic_batch
from openpcseg_tpu.engine import SegTask

N_PTS = 2500
NUM_CLASS = 20


def spvcnn_cfgs():
    return CfgDict({
        "MODALITY": "fusion",
        "DATA": {"DATASET": "semantickitti", "VOXEL_SIZE": 0.2},
        "MODEL": {
            "NAME": "SPVCNN", "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 4,
            "BLOCK": "ResBlock", "NUM_LAYER": [1, 1, 1, 1, 1, 1, 1, 1],
            "PLANES": [8, 8, 16, 16, 16, 16, 16, 8, 8], "cr": 1.0,
            "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.0,
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 2, "OPTIMIZER": "adam",
            "LR_PER_SAMPLE": 0.002, "WEIGHT_DECAY": 0.0,
            "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 3072,
                "VOXEL_CAP_RATIOS": [1.0, 1.0, 0.9, 0.7, 0.5]},
    })


def cylinder_cfgs():
    return CfgDict({
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
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 2, "OPTIMIZER": "adam",
            "LR_PER_SAMPLE": 0.002, "WEIGHT_DECAY": 0.0,
            "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 3072,
                "VOXEL_CAP_RATIOS": [1.0, 1.0, 0.9, 0.7, 0.5]},
    })


def make_batch(seed, batch=2):
    b = synthetic_batch(seed, batch, n_points=N_PTS, num_class=NUM_CLASS)
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.mark.parametrize("cfg_fn", [spvcnn_cfgs, cylinder_cfgs],
                         ids=["spvcnn", "cylinder3d"])
def test_train_and_eval(cfg_fn):
    task = SegTask(cfg_fn(), NUM_CLASS, batch_per_device=2,
                   iters_per_epoch=20, total_epochs=2)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, make_batch(0))
    step = jax.jit(task.train_step)
    losses = []
    for i in range(12):
        state, m = step(state, make_batch(i % 3), rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses  # learning signal exists

    out = jax.jit(task.eval_step)(state, make_batch(0))
    hist = np.asarray(out["hist"], np.int64)
    assert hist.sum() == 2 * N_PTS  # every point covered


def rpvnet_cfgs():
    return CfgDict({
        "MODALITY": "fusion",
        "DATA": {"DATASET": "semantickitti", "VOXEL_SIZE": 0.2},
        "MODEL": {
            "NAME": "RPVNet", "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 5,
            "BLOCK": "ResBlock", "NUM_LAYER": [1, 1, 1, 1, 1, 1, 1, 1],
            "PLANES": [8, 8, 16, 16, 16, 16, 16, 8, 8], "cr": 1.0,
            "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.0,
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 2, "OPTIMIZER": "adam",
            "LR_PER_SAMPLE": 0.002, "WEIGHT_DECAY": 0.0,
            "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 3072,
                "VOXEL_CAP_RATIOS": [1.0, 1.0, 0.9, 0.7, 0.5]},
    })


def make_fusion_batch(seed, batch=2, h=32, w=256):
    """Synthetic fusion batch: padded points + range image + pxpy."""
    from openpcseg_tpu.data import synthetic_scan, pad_scan
    from openpcseg_tpu.data.fusion_view import build_fusion_range_image
    rng = np.random.default_rng(seed)
    out = {k: [] for k in ("xyz", "feats", "labels", "valid",
                           "range_image", "pxpy")}
    for i in range(batch):
        xyz, feats, lab = synthetic_scan(seed * 100 + i, n_points=N_PTS,
                                         num_class=NUM_CLASS)
        ring = rng.integers(0, h, size=(len(xyz), 1)).astype(np.float32)
        pts5 = np.concatenate([feats, ring], axis=1)  # x,y,z,i,ring
        img, pxpy = build_fusion_range_image(pts5, h, w, rng)
        px, pf, pl, pv = pad_scan(xyz, pts5, lab, N_PTS)
        ppxpy = np.zeros((N_PTS, 2), np.float32)
        ppxpy[:len(pxpy)] = pxpy[:N_PTS]
        out["xyz"].append(px); out["feats"].append(pf)
        out["labels"].append(pl); out["valid"].append(pv)
        out["range_image"].append(img); out["pxpy"].append(ppxpy)
    return {k: jnp.asarray(np.stack(v)) for k, v in out.items()}


def test_rpvnet_train_and_eval():
    task = SegTask(rpvnet_cfgs(), NUM_CLASS, batch_per_device=2,
                   iters_per_epoch=20, total_epochs=2)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, make_fusion_batch(0))
    step = jax.jit(task.train_step)
    losses = []
    for i in range(10):
        state, m = step(state, make_fusion_batch(i % 3), rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    out = jax.jit(task.eval_step)(state, make_fusion_batch(0))
    hist = np.asarray(out["hist"], np.int64)
    assert hist.sum() == 2 * N_PTS
