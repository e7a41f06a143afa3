"""Loss plumbing through SegTask: WCELoss gets the dataset cls_num_pts and
GroupSoftmax gets the dataset class_names without any per-config tables
(VERDICT r1 #5; reference pcseg/loss/__init__.py:15-26 accepts both but no
reference call site wires them).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data import synthetic_batch
from openpcseg_tpu.engine import SegTask


def cfgs_for(dataset, num_class, loss_types, loss_weights):
    return CfgDict({
        "DATA": {"DATASET": dataset, "VOXEL_SIZE": 0.2},
        "MODEL": {
            "NAME": "MinkUNet", "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 4,
            "BLOCK": "ResBlock", "NUM_LAYER": [1, 1, 1, 1, 1, 1, 1, 1],
            "PLANES": [8, 8, 16, 16, 16, 16, 16, 8, 8], "cr": 1.0,
            "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.0,
            "LOSS_CONFIG": {"LOSS_TYPES": loss_types,
                            "LOSS_WEIGHTS": loss_weights},
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1, "OPTIMIZER": "adam",
            "LR_PER_SAMPLE": 0.001, "WEIGHT_DECAY": 0.0,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 4096},
    })


def run_one_step(dataset, num_class, loss_types, loss_weights):
    task = SegTask(cfgs_for(dataset, num_class, loss_types, loss_weights),
                   num_class, batch_per_device=1, iters_per_epoch=10,
                   total_epochs=1)
    b = synthetic_batch(0, 1, n_points=2000, num_class=num_class)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch)
    state, m = jax.jit(task.train_step)(state, batch, rng)
    return float(m["loss"])


def test_wce_gets_dataset_table():
    # WCELoss needs cls_num_pts — SegTask must supply the published
    # SemanticKITTI table automatically. Assert the plumbing directly on
    # the task's Losses (no full train-step compile: that e2e lives in the
    # slow tier below).
    task = SegTask(cfgs_for("semantickitti", 20, ["WCELoss"], [1.0]),
                   20, batch_per_device=1, iters_per_epoch=10,
                   total_epochs=1)
    pts = task.losses.cls_num_pts
    assert pts is not None and pts.shape == (20,)
    # road (id 9) is among the most frequent classes in the table
    assert float(pts[9]) > float(pts[2]) * 100
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(256, 20)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 20, 256).astype(np.int32))
    valid = jnp.asarray(rng.random(256) < 0.9)
    loss = float(task.losses(logits, labels, valid))
    assert np.isfinite(loss) and loss > 0


@pytest.mark.slow
def test_wce_loss_trains_semantickitti():
    # e2e: the table reaches the jitted train step
    loss = run_one_step("semantickitti", 20, ["WCELoss"], [1.0])
    assert np.isfinite(loss) and loss > 0


@pytest.mark.slow
def test_group_softmax_trains_waymo():
    loss = run_one_step("waymo", 23, ["CELoss", "GroupSoftmax"], [1.0, 1.0])
    assert np.isfinite(loss) and loss > 0


def test_dataset_meta_tables():
    from openpcseg_tpu.data import dataset_meta
    from openpcseg_tpu.data.semantickitti_meta import CLASS_CONTENT

    names, pts = dataset_meta("semantickitti")
    assert len(names) == 20 and len(pts) == 20
    assert pts[0] == 1  # ignore class: nominal 1, weight zeroed in WCE
    # road (id 9) is among the most frequent classes
    assert pts[9] > pts[2] * 100
    # fractions sum to ~1 minus the unlabeled/outlier share (~3%)
    assert 0.9 < sum(CLASS_CONTENT) < 1.0

    wnames, wpts = dataset_meta("waymo")
    assert len(wnames) == 23 and wpts is None
