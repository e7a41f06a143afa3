"""nuScenes-lidarseg family: reader, label mapping, views, loader.

Fabricates a miniature nuScenes tree (JSON tables + .pcd.bin + lidarseg
bins) and exercises the full devkit-free path. The reference names these
dataset classes in its factory but never ships them
(reference pcseg/data/__init__.py:59-87) — functionality is validated
against the documented nuScenes-lidarseg formats instead.
"""
import json
import os

import numpy as np
import pytest

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data.nuscenes_meta import (
    CLASS_NAMES,
    LEARNING_MAP_LUT,
    LEARNING_MAP_INV,
)


def make_mini_nuscenes(root, n_scenes=3, samples_per_scene=2, n_pts=2048,
                       seed=0):
    rng = np.random.default_rng(seed)
    version = "v1.0-trainval"
    os.makedirs(f"{root}/{version}", exist_ok=True)
    os.makedirs(f"{root}/samples/LIDAR_TOP", exist_ok=True)
    os.makedirs(f"{root}/lidarseg/{version}", exist_ok=True)

    scenes, samples, sample_data, lidarseg = [], [], [], []
    for s in range(n_scenes):
        scene_tok = f"scene{s:04d}"
        scenes.append({"token": scene_tok, "name": f"scene-{s:04d}"})
        for k in range(samples_per_scene):
            samp_tok = f"samp{s:04d}_{k}"
            sd_tok = f"sd{s:04d}_{k}"
            samples.append({"token": samp_tok, "scene_token": scene_tok})
            fn = f"samples/LIDAR_TOP/host_{s:04d}_{k}.pcd.bin"
            sample_data.append({
                "token": sd_tok, "sample_token": samp_tok,
                "filename": fn, "is_key_frame": True,
                "fileformat": "pcd",
            })
            # a non-key-frame sweep that must be skipped
            sample_data.append({
                "token": sd_tok + "_sweep", "sample_token": samp_tok,
                "filename": f"sweeps/LIDAR_TOP/sw_{s}_{k}.pcd.bin",
                "is_key_frame": False, "fileformat": "pcd",
            })
            pts = np.zeros((n_pts, 5), np.float32)
            pts[:, :3] = rng.normal(scale=20.0, size=(n_pts, 3))
            pts[:, 3] = rng.random(n_pts) * 255
            pts[:, 4] = rng.integers(0, 32, n_pts)
            pts.tofile(f"{root}/{fn}")
            lab_fn = f"lidarseg/{version}/{sd_tok}_lidarseg.bin"
            raw = rng.integers(0, 32, n_pts).astype(np.uint8)
            raw.tofile(f"{root}/{lab_fn}")
            lidarseg.append({"token": f"ls{s}_{k}",
                             "sample_data_token": sd_tok,
                             "filename": lab_fn})

    for name, tbl in [("scene", scenes), ("sample", samples),
                      ("sample_data", sample_data),
                      ("lidarseg", lidarseg)]:
        with open(f"{root}/{version}/{name}.json", "w") as f:
            json.dump(tbl, f)
    return root


def test_learning_map_tables():
    assert len(CLASS_NAMES) == 17
    assert LEARNING_MAP_LUT.shape == (32,)
    # official mapping spot checks
    assert LEARNING_MAP_LUT[17] == 4          # car
    assert LEARNING_MAP_LUT[24] == 11         # driveable_surface
    assert LEARNING_MAP_LUT[2] == 7           # pedestrian (adult)
    assert LEARNING_MAP_LUT[31] == 0          # ego vehicle -> ignore
    assert set(LEARNING_MAP_LUT.tolist()) == set(range(17))
    # inverse maps back into each class
    for c in range(17):
        assert LEARNING_MAP_LUT[LEARNING_MAP_INV[c]] == c


def test_reader_and_splits(tmp_path):
    from openpcseg_tpu.data.nuscenes import NuscenesDataset

    root = make_mini_nuscenes(str(tmp_path))
    cfg = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root,
                   "AUGMENT": "NoAugment"})
    tr = NuscenesDataset(cfg, training=True)
    va = NuscenesDataset(cfg, training=False)
    # scene-level split: disjoint, covers all 6 key frames
    tr_scenes = {r["scene"] for r in tr.annos}
    va_scenes = {r["scene"] for r in va.annos}
    assert tr_scenes and va_scenes and not (tr_scenes & va_scenes)
    assert len(tr.annos) + len(va.annos) == 6

    item = va[0]
    assert item["xyzret"].shape[1] == 5
    assert item["labels"].dtype == np.int32
    assert item["labels"].min() >= 0 and item["labels"].max() <= 16
    # ring column preserved from the sensor data
    assert np.all(item["xyzret"][:, 4] == np.round(item["xyzret"][:, 4]))


def test_reader_scan_mix(tmp_path):
    from openpcseg_tpu.data.nuscenes import NuscenesDataset

    root = make_mini_nuscenes(str(tmp_path))
    cfg = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root})
    tr = NuscenesDataset(cfg, training=True, seed=3)
    for i in range(min(len(tr), 3)):
        item = tr[i]
        assert item["xyzret"].shape[1] == 5
        assert len(item["labels"]) == len(item["xyzret"])


def test_voxel_view_and_loader(tmp_path):
    from openpcseg_tpu.data import build_dataloader

    root = make_mini_nuscenes(str(tmp_path))
    cfg = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root,
                   "AUGMENT": "NoAugment"})
    ds, loader = build_dataloader(cfg, "voxel", batch_size=2,
                                  training=False, point_cap=4096,
                                  num_workers=0)
    batch = next(iter(loader))
    assert batch["xyz"].shape == (2, 4096, 3)
    assert batch["feats"].shape == (2, 4096, 4)
    assert batch["labels"].shape == (2, 4096)
    assert batch["valid"].any()


def test_range_view(tmp_path):
    from openpcseg_tpu.data import build_dataloader

    root = make_mini_nuscenes(str(tmp_path))
    cfg = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root,
                   "AUGMENT": "NoAugment"})
    ds, loader = build_dataloader(cfg, "range", batch_size=1,
                                  training=False, point_cap=4096,
                                  num_workers=0)
    batch = next(iter(loader))
    assert batch["scan"].shape[1:3] == (32, 1088)
    assert batch["label"].shape[1:3] == (32, 1088)
    # nuScenes FOV: rows occupied beyond the KITTI band
    assert batch["mask"].sum() > 0


def test_fusion_view(tmp_path):
    from openpcseg_tpu.data import build_dataloader

    root = make_mini_nuscenes(str(tmp_path))
    cfg = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root,
                   "AUGMENT": "NoAugment"})
    ds, loader = build_dataloader(cfg, "fusion", batch_size=1,
                                  training=False, point_cap=4096,
                                  num_workers=0)
    batch = next(iter(loader))
    assert batch["range_image"].shape[1:] == (32, 1088, 5)
    assert batch["pxpy"].shape == (1, 4096, 2)


def test_semi_sup_split_file(tmp_path):
    from openpcseg_tpu.data.nuscenes import NuscenesDataset

    root = make_mini_nuscenes(str(tmp_path))
    cfg0 = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root,
                    "AUGMENT": "NoAugment"})
    full = NuscenesDataset(cfg0, training=True)
    keep = [os.path.basename(full.annos[0]["path"])]
    sf = tmp_path / "split.txt"
    sf.write_text("\n".join(keep) + "\n")
    cfg = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root,
                   "AUGMENT": "NoAugment", "SPLIT_FILE": str(sf)})
    restricted = NuscenesDataset(cfg, training=True)
    assert len(restricted.annos) == 1


def test_raw_id_submission_dump(tmp_path):
    """--save_raw_ids for nuScenes: official lidarseg submission layout
    (<sample_data_token>_lidarseg.bin, uint8 raw category ids)."""
    import jax
    import jax.numpy as jnp
    from pathlib import Path

    from infer import dump_predictions
    from openpcseg_tpu.data.nuscenes import NuscenesDataset

    root = make_mini_nuscenes(str(tmp_path / "nusc"))
    cfg = CfgDict({"DATASET": "nuscenes", "DATA_PATH": root,
                   "AUGMENT": "NoAugment"})
    src = NuscenesDataset(cfg, training=False)
    rec = src.annos[0]
    n = 64

    class StubTask:
        def predict_step(self, state, batch):
            return jnp.tile(jnp.arange(17, dtype=jnp.int32), n // 17 + 1)[
                None, :n]

    class StubTrainer:
        cfgs = CfgDict({"DATA": {"DATASET": "nuscenes"}})
        val_set = src
        task = StubTask()
        state = None
        val_loader = [{
            "name": [rec["path"]],
            "valid": np.ones((1, n), bool),
        }]

        def _device_batch(self, b):
            # the real Trainer._device_batch strips non-array fields
            return {k: v for k, v in b.items() if k != "name"}

    out = tmp_path / "preds"
    cnt = dump_predictions(StubTrainer(), Path(out), raw_ids=True)
    assert cnt == 1
    f = out / "lidarseg" / "val" / f"{rec['token']}_lidarseg.bin"
    assert f.exists()
    raw = np.fromfile(f, np.uint8)
    assert len(raw) == n
    # every id inverts back to its train id
    from openpcseg_tpu.data.nuscenes_meta import LEARNING_MAP_LUT
    preds = np.asarray(
        StubTask().predict_step(None, None))[0]
    assert (LEARNING_MAP_LUT[raw] == preds).all()
