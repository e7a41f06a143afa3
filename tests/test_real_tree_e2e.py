"""Real-format end-to-end rehearsal (VERDICT r3 next-#8).

Fabricates miniature on-disk dataset trees in the REAL file formats
(tests/mini_trees.py) and drives the actual CLIs — train.py then
infer.py --save_pred --save_raw_ids — in-process with patched argv, per
dataset x modality. Asserts the training loop runs, checkpoints land, and
the submission-format dumps byte-parse.

Reference surfaces exercised: semantickitti.py:104-115 (.bin/.label
readers + LUT remap), waymo.py:78-96 (.npy dual-return reader),
infer.py:424-438 (per-scan prediction dumps).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

from mini_trees import KITTI_RAW_IDS, make_mini_kitti, make_mini_waymo

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

TINY_SETS = [
    "TPU.POINT_CAP_PER_SCAN", "8192", "TPU.VOXEL_CAP_PER_SCAN", "8192",
]
TINY_MINK = TINY_SETS + [
    "MODEL.NUM_LAYER", "[1,1,1,1,1,1,1,1]", "MODEL.cr", "0.25",
]


def run_cli(script: str, argv: list):
    """Run a repo CLI in-process (conftest already pins the CPU platform;
    a subprocess would re-pay the jax import + compile for every case)."""
    import runpy

    old = sys.argv
    sys.argv = [script] + [str(a) for a in argv]
    try:
        runpy.run_path(str(REPO / script), run_name="__main__")
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti") / "sequences"
    return make_mini_kitti(root, scans_per_seq=2, n_pts=4000)


@pytest.fixture(scope="module")
def waymo_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("waymo")
    make_mini_waymo(root, n_frames=2, n_pts=4000, training=True)
    make_mini_waymo(root, n_frames=2, n_pts=4000, training=False)
    return str(root)


def _train_and_dump(cfg_file, data_path, log_dir, sets, extra_infer=()):
    # --num_devices 1: conftest exposes 8 virtual CPU devices, and an
    # 8-device mesh's global batch would exceed the mini tree (the mesh
    # path is covered by test_parallel/dryrun_multichip)
    run_cli("train.py", [
        "--cfg_file", cfg_file, "--extra_tag", "e2e", "--log_dir", log_dir,
        "--epochs", "1", "--batch_size", "2", "--log_interval", "1",
        "--workers", "1", "--num_devices", "1",
        "--set", "DATA.DATA_PATH", data_path, *sets,
    ])
    exp = next(Path(log_dir).glob("**/ckp"))
    assert any(exp.iterdir()), "no checkpoint saved"
    run_cli("infer.py", [
        "--cfg_file", cfg_file, "--extra_tag", "e2e", "--log_dir", log_dir,
        "--batch_size", "2", "--workers", "1", "--num_devices", "1",
        "--save_pred", *extra_infer,
        "--set", "DATA.DATA_PATH", data_path,
        "DATA.OUTPUT_DIR", str(Path(log_dir) / "preds"), *sets,
    ])
    return Path(log_dir) / "preds"


def test_semantickitti_voxel_train_infer_submission(kitti_tree, tmp_path):
    preds = _train_and_dump(
        "tools/cfgs/voxel/semantic_kitti/minkunet_mk34_cr10.yaml",
        kitti_tree, str(tmp_path / "logs"), TINY_MINK,
        extra_infer=["--save_raw_ids"],
    )
    # official submission layout: sequences/08/predictions/<frame>.label,
    # uint32 raw ids, one id per point of the original scan
    labels = sorted(preds.glob("sequences/08/predictions/*.label"))
    assert len(labels) == 2, labels
    from openpcseg_tpu.data.semantickitti_meta import LEARNING_MAP_INV_LUT
    legal = set(np.asarray(LEARNING_MAP_INV_LUT).tolist())
    for f in labels:
        raw = np.fromfile(f, dtype=np.uint32)
        assert len(raw) == 4000  # every original point got a prediction
        # predictions remap to canonical raw ids via the inverse map
        assert set(np.unique(raw).tolist()) <= legal


def test_semantickitti_range_train_infer(kitti_tree, tmp_path):
    preds = _train_and_dump(
        "tools/cfgs/range/semantic_kitti/cenet_64x2048.yaml",
        kitti_tree, str(tmp_path / "logs"),
        ["DATA.H", "32", "DATA.W", "512", "TPU.POINT_CAP_PER_SCAN", "8192"],
    )
    npys = sorted(preds.glob("*.npy"))
    assert len(npys) == 2, npys
    for f in npys:
        p = np.load(f)
        assert p.dtype == np.int32 and (p >= 0).all() and (p < 20).all()


def test_semantickitti_cylinder_train_infer(kitti_tree, tmp_path):
    preds = _train_and_dump(
        "tools/cfgs/voxel/semantic_kitti/cylinder_cy480_cr10.yaml",
        kitti_tree, str(tmp_path / "logs"),
        TINY_SETS + ["MODEL.INIT_SIZE", "8",
                     "DATA.CYLINDER_GRID_SIZE", "[48,36,8]"],
        extra_infer=["--save_raw_ids"],
    )
    labels = sorted(preds.glob("sequences/08/predictions/*.label"))
    assert len(labels) == 2, labels
    for f in labels:
        raw = np.fromfile(f, dtype=np.uint32)
        assert len(raw) == 4000


def test_semantickitti_fusion_train_infer(kitti_tree, tmp_path):
    preds = _train_and_dump(
        "tools/cfgs/fusion/semantic_kitti/rpvnet_mk18_cr10.yaml",
        kitti_tree, str(tmp_path / "logs"),
        TINY_SETS + ["MODEL.NUM_LAYER", "[1,1,1,1,1,1,1,1]",
                     "MODEL.cr", "0.25", "DATA.H", "32", "DATA.W", "512"],
    )
    npys = sorted(preds.glob("*.npy"))
    assert len(npys) == 2, npys


def test_waymo_voxel_train_infer(waymo_tree, tmp_path):
    preds = _train_and_dump(
        "tools/cfgs/voxel/waymo/minkunet_mk34_cr16.yaml",
        waymo_tree, str(tmp_path / "logs"), TINY_MINK,
    )
    npys = sorted(preds.glob("*.npy"))
    assert len(npys) == 2, npys
    for f in npys:
        p = np.load(f)
        # dual return: first (4000) + second (1000) points, all predicted
        assert p.shape == (5000,) and (p >= 0).all() and (p < 23).all()
