"""Materialize ray-cast surrogate scans as an on-disk SemanticKITTI tree.

Writes full-size (~100-131k point) raycast scans (data/raycast.py) as
`.bin` (x,y,z,intensity float32) + `.label` (uint32 raw ids, upper 16 bits
random instance) pairs under `<root>/sequences/{00,08}/...` so the REAL
training CLI — reader, LUT remap, augmentations, thread-pool BatchLoader —
can be driven at production scan sizes and its host pipeline measured
under load (reference analog: train.py:336-390 data_time/batch_time
meters; loader pcseg/data/__init__.py:96-139).

Train labels are inverted to raw ids via the first LEARNING_MAP entry per
class, so the reader's LUT remap reproduces the exact train labels.

Usage: python tools/scripts/make_raycast_kitti.py /tmp/kitti_rc [n_train] [n_val]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from openpcseg_tpu.data.raycast import raycast_scan  # noqa: E402
from openpcseg_tpu.data.semantickitti_meta import LEARNING_MAP  # noqa: E402


def first_raw_id_per_class(num_class: int = 20) -> np.ndarray:
    inv = np.zeros(num_class, np.uint32)
    for raw, train in sorted(LEARNING_MAP.items()):
        if train < num_class and inv[train] == 0 and train != 0:
            inv[train] = raw
    inv[0] = 0  # unlabeled
    return inv


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti_rc"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    inv = first_raw_id_per_class()
    rng = np.random.default_rng(0)
    for seq, n, seed0 in (("00", n_train, 0), ("08", n_val, 10_000)):
        vdir = os.path.join(root, "sequences", seq, "velodyne")
        ldir = os.path.join(root, "sequences", seq, "labels")
        os.makedirs(vdir, exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        for i in range(n):
            _, feats, lab = raycast_scan(seed0 + i)
            raw = inv[np.clip(lab, 0, len(inv) - 1)].astype(np.uint32)
            inst = rng.integers(0, 2 ** 16, len(raw), dtype=np.uint32)
            raw = raw | (inst << 16)
            feats.astype(np.float32).tofile(
                os.path.join(vdir, f"{i:06d}.bin"))
            raw.tofile(os.path.join(ldir, f"{i:06d}.label"))
            if i % 10 == 0:
                print(f"seq {seq}: {i + 1}/{n} ({len(raw)} pts)", flush=True)
    print(f"done -> {root}/sequences")


if __name__ == "__main__":
    main()
