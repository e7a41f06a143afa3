"""Semi-sup split lists: vendored files exist and the reader filters by them.

Reference: pcseg/data/split/{semantickitti,scribblekitti}/*_{1,10,20,50}pct.txt
consumed via DistributedSampler subsets; here via DATA.SPLIT_FILE
(semantickitti.py:67-77).
"""
from pathlib import Path

import numpy as np
import pytest

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data.semantickitti import SemantickittiDataset

SPLIT_DIR = Path(__file__).resolve().parents[1] / "openpcseg_tpu/data/split"


@pytest.mark.parametrize("ds", ["semantickitti", "scribblekitti"])
@pytest.mark.parametrize("pct", [1, 10, 20, 50])
def test_split_lists_vendored(ds, pct):
    f = SPLIT_DIR / ds / f"{ds}_{pct}pct.txt"
    assert f.is_file()
    lines = [ln for ln in f.read_text().splitlines() if ln.strip()]
    assert len(lines) > 100
    # every entry names a train-sequence scan: <seq>/velodyne/<frame>.bin
    seq, kind, frame = lines[0].split("/")[-3:]
    assert kind == "velodyne" and frame.endswith(".bin") and seq.isdigit()


def test_reader_filters_by_split_file(tmp_path):
    # fake dataset: sequence 00 with 10 scans, sequence 01 with 5
    for seq, n in [("00", 10), ("01", 5)]:
        d = tmp_path / seq / "velodyne"
        ld = tmp_path / seq / "labels"
        d.mkdir(parents=True)
        ld.mkdir(parents=True)
        for i in range(n):
            np.zeros((16, 4), np.float32).tofile(d / f"{i:06d}.bin")
            np.zeros(16, np.uint32).tofile(ld / f"{i:06d}.label")

    split = tmp_path / "subset.txt"
    split.write_text(
        "/data_odometry_velodyne/dataset/sequences/train/00/velodyne/000002.bin\n"
        "/data_odometry_velodyne/dataset/sequences/train/01/velodyne/000004.bin\n"
    )
    cfgs = CfgDict({
        "DATA_PATH": str(tmp_path),
        "SPLIT_FILE": str(split),
        "AUGMENT": "NoAugment",
    })
    ds = SemantickittiDataset(cfgs, training=True)
    assert len(ds.annos) == 2
    got = {"/".join(a.split("/")[-3:]) for a in ds.annos}
    assert got == {"00/velodyne/000002.bin", "01/velodyne/000004.bin"}
