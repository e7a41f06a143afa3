"""Waymo fusion view end-to-end: fabricated frames -> inclination-binned
range image + voxel sample -> one RPVNet train step.

The upstream WaymoFusionDataset (reference waymo_fusion.py:56-133) never
builds a range image (its fusion view is byte-identical to the voxel view),
so RPVNet-on-Waymo cannot run upstream; here it must.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data import build_dataloader
from openpcseg_tpu.data.voxel_view import collate
from openpcseg_tpu.engine import SegTask

N_FRAMES = 3


@pytest.fixture()
def waymo_root(tmp_path):
    rng = np.random.default_rng(0)
    first = tmp_path / "first"
    first.mkdir()
    names = []
    for i in range(N_FRAMES):
        n = 3000
        arr = np.zeros((n, 8), np.float32)
        arr[:, 1:3] = rng.random((n, 2))            # intensity, elongation
        arr[:, 3:5] = rng.uniform(-40, 40, (n, 2))  # x, y
        arr[:, 5] = rng.uniform(-2, 4, n)           # z
        arr[:, -1] = rng.integers(0, 23, n)         # label
        p = first / f"{i:05d}.npy"
        np.save(p, arr)
        names.append(str(p))
    (tmp_path / "train-0-31.txt").write_text("\n".join(names) + "\n")
    (tmp_path / "val-0-7.txt").write_text("\n".join(names) + "\n")
    return tmp_path


def test_waymo_fusion_view_sample(waymo_root):
    cfgs = CfgDict({"DATASET": "waymo", "DATA_PATH": str(waymo_root),
                    "VOXEL_SIZE": 0.2, "AUGMENT": "NoAugment"})
    ds, loader = build_dataloader(
        cfgs, "fusion", 1, training=True, point_cap=4096, num_workers=1)
    assert len(ds) == N_FRAMES
    assert ds.class_names[0] == "undefined" or len(ds.class_names) == 23
    s = ds[0]
    assert s["range_image"].shape[0] == 64          # inclination rows
    assert s["range_image"].shape[2] == 5
    assert s["pxpy"].shape[1] == 2
    assert (s["range_image"][..., 0] != 0).sum() > 200
    assert s["feats"].shape[1] == 5                 # x,y,z,tanh(i),tanh(e)


@pytest.mark.slow
def test_rpvnet_on_waymo_one_step(waymo_root):
    cfgs = CfgDict({
        "MODALITY": "fusion",
        "DATA": {"DATASET": "waymo", "DATA_PATH": str(waymo_root),
                 "VOXEL_SIZE": 0.2, "AUGMENT": "NoAugment"},
        "MODEL": {
            "NAME": "RPVNet", "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 5,
            "BLOCK": "ResBlock", "NUM_LAYER": [1, 1, 1, 1, 1, 1, 1, 1],
            "PLANES": [8, 8, 16, 16, 16, 16, 16, 8, 8], "cr": 1.0,
            "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.0,
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1, "OPTIMIZER": "adam",
            "LR_PER_SAMPLE": 0.002, "WEIGHT_DECAY": 0.0,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 4096},
    })
    ds, _ = build_dataloader(
        cfgs.DATA, "fusion", 1, training=True, point_cap=4096,
        num_workers=1)
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0]]).items()
             if k != "name"}
    task = SegTask(cfgs, num_class=23, batch_per_device=1,
                   iters_per_epoch=3, total_epochs=1)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch)
    state, m = jax.jit(task.train_step)(state, batch, rng)
    assert np.isfinite(float(m["loss"]))
