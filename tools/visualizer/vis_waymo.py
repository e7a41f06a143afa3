"""Waymo point-cloud + prediction visualizer.

Counterpart of the reference viewer (reference: tools/scripts/
vis_waymo.py:38-223, open3d-based): renders an unpacked frame (.npy) with
either its labels or a prediction dump from infer.py --save_pred.
Falls back to a matplotlib BEV PNG when open3d is unavailable.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def waymo_colors(labels: np.ndarray) -> np.ndarray:
    rng = np.random.default_rng(4)
    lut = rng.random((23, 3)).astype(np.float32)
    lut[0] = 0.3
    return lut[np.clip(labels, 0, 22)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", required=True, help=".npy frame (first return)")
    ap.add_argument("--pred", default=None)
    ap.add_argument("--out", default="vis_waymo.png")
    args = ap.parse_args()

    arr = np.load(args.frame)
    xyz = arr[:, 3:6]
    labels = (np.load(args.pred).reshape(-1)[:len(xyz)]
              if args.pred else arr[:, -1].astype(np.int32))
    colors = waymo_colors(labels)

    try:
        import open3d as o3d
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(xyz.astype(np.float64))
        pc.colors = o3d.utility.Vector3dVector(colors.astype(np.float64))
        o3d.visualization.draw_geometries([pc])
    except ImportError:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(12, 12), facecolor="black")
        ax.scatter(xyz[:, 0], xyz[:, 1], s=0.3, c=colors, linewidths=0)
        ax.set_aspect("equal"); ax.axis("off"); ax.set_facecolor("black")
        fig.savefig(args.out, dpi=150, bbox_inches="tight", facecolor="black")
        print(f"open3d unavailable; saved BEV render to {args.out}")


if __name__ == "__main__":
    main()
