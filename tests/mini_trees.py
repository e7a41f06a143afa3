"""Fabricate miniature on-disk dataset trees in the REAL file formats.

Used by the slow-tier end-to-end rehearsal tests (and the verify recipe):
synthetic batches exercise the math, these trees exercise the actual
readers, path conventions, and submission-format dumps
(reference: semantickitti.py:104-115, waymo.py:78-96, infer.py:424-438).
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

# raw (pre-LEARNING_MAP) SemanticKITTI ids, a representative subset
KITTI_RAW_IDS = np.array(
    [0, 10, 30, 40, 48, 50, 70, 72, 80, 81, 252], np.uint32)


def make_mini_kitti(root, seqs=("00", "08"), scans_per_seq=3,
                    n_pts=6000, seed=0) -> str:
    """Write sequences/<seq>/{velodyne/*.bin, labels/*.label}.

    Returns the DATA_PATH to pass to the configs (the sequences dir).
    .bin = float32 (x,y,z,intensity); .label = uint32 with instance ids in
    the upper 16 bits (the reader must mask them off)."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    for seq in seqs:
        vdir = root / seq / "velodyne"
        ldir = root / seq / "labels"
        vdir.mkdir(parents=True, exist_ok=True)
        ldir.mkdir(parents=True, exist_ok=True)
        for i in range(scans_per_seq):
            r = rng.uniform(2.0, 45.0, n_pts)
            yaw = rng.uniform(-np.pi, np.pi, n_pts)
            pitch = rng.uniform(np.deg2rad(-24.0), np.deg2rad(2.0), n_pts)
            xyz = np.stack([r * np.cos(pitch) * np.cos(yaw),
                            r * np.cos(pitch) * np.sin(yaw),
                            r * np.sin(pitch)], 1)
            inten = rng.uniform(0, 1, n_pts)
            pts = np.concatenate(
                [xyz, inten[:, None]], 1).astype(np.float32)
            pts.tofile(vdir / f"{i:06d}.bin")
            sem = rng.choice(KITTI_RAW_IDS, n_pts).astype(np.uint32)
            inst = rng.integers(0, 8, n_pts).astype(np.uint32) << 16
            (sem | inst).astype(np.uint32).tofile(ldir / f"{i:06d}.label")
    return str(root)


def make_mini_waymo(root, n_frames=3, n_pts=6000, seed=0,
                    training=True, second_return=True) -> str:
    """Write the preprocessed Waymo .npy layout the reader consumes
    (data/waymo.py: rows [range, intensity, elongation, x, y, z, label];
    'first/' dir with an optional 'second/' sibling for the second lidar
    return; a split list file of absolute frame paths).

    Returns the DATA_PATH (split lists train-0-31.txt / val-0-7.txt are
    written under it)."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    split = "train" if training else "val"
    dirs = ["first", "second"] if second_return else ["first"]
    for d in dirs:
        (root / split / d).mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n_frames):
        for d in dirs:
            npts = n_pts if d == "first" else n_pts // 4
            r = rng.uniform(2.0, 60.0, npts)
            yaw = rng.uniform(-np.pi, np.pi, npts)
            pitch = rng.uniform(np.deg2rad(-18.0), np.deg2rad(2.0), npts)
            xyz = np.stack([r * np.cos(pitch) * np.cos(yaw),
                            r * np.cos(pitch) * np.sin(yaw),
                            r * np.sin(pitch)], 1)
            inten = rng.uniform(0, 4.0, npts)
            elong = rng.uniform(0, 2.0, npts)
            lab = rng.integers(0, 23, npts)
            arr = np.stack(
                [r, inten, elong, xyz[:, 0], xyz[:, 1], xyz[:, 2],
                 lab.astype(np.float64)], 1).astype(np.float32)
            np.save(root / split / d / f"seq0_frame{i}.npy", arr)
        paths.append(str(root / split / "first" / f"seq0_frame{i}.npy"))
    list_name = "train-0-31.txt" if training else "val-0-7.txt"
    with open(root / list_name, "w") as f:
        f.write("\n".join(paths) + "\n")
    return str(root)
