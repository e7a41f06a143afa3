"""Generate nuScenes scene-split + semi-supervised percentage lists.

The reference ships token lists under pcseg/data/split/nuscenes/
({1,10,20,50}pct) for its semi-supervised protocols but no code that can
read nuScenes at all. This script regenerates equivalent lists from a
local nuScenes tree, deterministically (seeded, scene-stratified so every
percentage keeps scene diversity):

    python tools/scripts/make_nuscenes_splits.py --root <nuScenes> \
        --out openpcseg_tpu/data/split/nuscenes

Outputs: train_scenes.txt / val_scenes.txt (85/15 scene split — swap in
the official devkit 700/150 lists if exact-protocol parity is needed) and
nuscenes_{1,10,20,50}pct.txt (lidar .pcd.bin basenames, loadable via
DATA.SPLIT_FILE).
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--out", default="openpcseg_tpu/data/split/nuscenes")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val_frac", type=float, default=0.15)
    args = ap.parse_args()

    root = Path(args.root)

    def table(name):
        with open(root / args.version / f"{name}.json") as f:
            return json.load(f)

    samples = {s["token"]: s for s in table("sample")}
    scenes = {s["token"]: s["name"] for s in table("scene")}
    recs = []
    for sd in table("sample_data"):
        fn = sd.get("filename", "")
        if not sd.get("is_key_frame") or "LIDAR_TOP" not in fn:
            continue
        recs.append((scenes[samples[sd["sample_token"]]["scene_token"]],
                     os.path.basename(fn)))
    recs.sort()

    rng = np.random.default_rng(args.seed)
    names = sorted({s for s, _ in recs})
    perm = rng.permutation(len(names))
    n_val = max(1, int(round(len(names) * args.val_frac)))
    val = sorted(names[i] for i in perm[:n_val])
    train = sorted(set(names) - set(val))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "train_scenes.txt").write_text("\n".join(train) + "\n")
    (out / "val_scenes.txt").write_text("\n".join(val) + "\n")

    train_recs = [(s, f) for s, f in recs if s in set(train)]
    for pct in (1, 10, 20, 50):
        picked = []
        for scene in train:
            fs = [f for s, f in train_recs if s == scene]
            k = max(1, int(round(len(fs) * pct / 100.0)))
            picked += list(rng.choice(fs, size=k, replace=False))
        (out / f"nuscenes_{pct}pct.txt").write_text(
            "\n".join(sorted(picked)) + "\n")
        print(f"{pct}pct: {len(picked)} scans")
    print(f"scenes: {len(train)} train / {len(val)} val; "
          f"{len(train_recs)} train scans")


if __name__ == "__main__":
    main()
