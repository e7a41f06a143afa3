"""End-to-end MinkUNet smoke tests on synthetic scans (hermetic).

The reference has no tests; its de-facto integration test is the golden
val-mIoU loop (SURVEY.md §4). Here a tiny MinkUNet must (a) run a jitted
train step, (b) reduce the loss over a few dozen steps on learnable
synthetic data, and (c) produce an eval confusion matrix whose mIoU beats
chance — exercising quantize, geometry, conv, BN, losses, optimizer and the
eval re-projection in one pass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data import synthetic_batch
from openpcseg_tpu.engine import SegTask
from openpcseg_tpu.utils import miou_from_hist


def tiny_cfgs(batch=2):
    return CfgDict({
        "DATA": {"DATASET": "semantickitti", "VOXEL_SIZE": 0.2},
        "MODEL": {
            "NAME": "MinkUNet",
            "IGNORE_LABEL": 0,
            "IN_FEATURE_DIM": 4,
            "BLOCK": "ResBlock",
            "NUM_LAYER": [1, 1, 1, 1, 1, 1, 1, 1],
            "PLANES": [8, 8, 16, 16, 16, 16, 16, 8, 8],
            "cr": 1.0,
            "DROPOUT_P": 0.0,
            "LABEL_SMOOTHING": 0.0,
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": batch,
            "NUM_EPOCHS": 4,
            # adam converges fast enough for a CPU smoke test; the SGD path
            # is covered by test_optim.py schedule/optimizer unit tests
            "OPTIMIZER": "adam",
            "LR_PER_SAMPLE": 0.002,
            "WEIGHT_DECAY": 0.0001,
            "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay",
            "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 4096,
                "VOXEL_CAP_RATIOS": [1.0, 1.0, 0.9, 0.7, 0.5]},
    })


N_PTS = 4000
NUM_CLASS = 20


def make_batch(seed, batch=2):
    b = synthetic_batch(seed, batch, n_points=N_PTS, num_class=NUM_CLASS)
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.fixture(scope="module")
def task():
    return SegTask(tiny_cfgs(), NUM_CLASS, batch_per_device=2,
                   iters_per_epoch=30, total_epochs=4)


@pytest.fixture(scope="module")
def trained(task):
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, make_batch(0))
    step = jax.jit(task.train_step)
    losses = []
    for i in range(100):
        state, m = step(state, make_batch(i % 5), rng)
        losses.append(float(m["loss"]))
    return state, losses


def test_loss_decreases(trained):
    _, losses = trained
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7, losses


def test_eval_miou_beats_chance(task, trained):
    state, _ = trained
    estep = jax.jit(task.eval_step)
    hist = np.zeros((NUM_CLASS, NUM_CLASS), np.int64)
    # eval on the training scans: a 100-step smoke run must at least
    # memorize structure well above the ~5% chance level of 19 classes
    for i in range(3):
        out = estep(state, make_batch(i))
        hist += np.asarray(out["hist"], np.int64)
    miou, iou = miou_from_hist(hist, np.arange(NUM_CLASS - 1))
    assert miou > 25.0, (miou, iou)


def test_eval_covers_all_points(task, trained):
    state, _ = trained
    out = jax.jit(task.eval_step)(state, make_batch(200))
    # every valid, in-range-label point lands in the confusion matrix
    assert int(np.asarray(out["hist"]).sum()) == 2 * N_PTS


def test_train_step_metrics(task, trained):
    state, _ = trained
    _, m = jax.jit(task.train_step)(state, make_batch(1), jax.random.PRNGKey(1))
    assert int(m["voxel_overflow"]) == 0
    assert int(m["num_voxels"]) > 0
    assert float(m["lr"]) > 0
