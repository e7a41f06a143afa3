"""SemanticKITTI point-cloud + segmentation visualizer.

Counterpart of the reference viewer (reference: tools/visualizer/
vis_SemanticKITTI.py:14-225, open3d-based). This environment ships no
open3d; when it is available we use it, otherwise we fall back to a
matplotlib bird's-eye-view render saved to PNG.

    python tools/visualizer/vis_semantickitti.py --scan <bin> \
        [--label <label> | --pred <npy>] [--out vis.png]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from openpcseg_tpu.data.semantickitti_meta import COLOR_MAP, remap_labels  # noqa: E402


def label_colors(labels: np.ndarray) -> np.ndarray:
    lut = np.zeros((max(COLOR_MAP) + 1, 3), np.float32)
    for k, bgr in COLOR_MAP.items():
        lut[k] = np.asarray(bgr[::-1], np.float32) / 255.0  # bgr -> rgb
    return lut[np.clip(labels, 0, len(lut) - 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", required=True)
    ap.add_argument("--label", default=None, help="raw .label file")
    ap.add_argument("--pred", default=None, help=".npy train-id predictions")
    ap.add_argument("--out", default="vis.png")
    args = ap.parse_args()

    pts = np.fromfile(args.scan, dtype=np.float32).reshape(-1, 4)
    if args.pred:
        labels = np.load(args.pred).reshape(-1)
    elif args.label:
        raw = np.fromfile(args.label, dtype=np.uint32)
        labels = remap_labels(raw)
    else:
        labels = np.zeros(len(pts), np.int32)
    colors = label_colors(labels[:len(pts)])

    try:
        import open3d as o3d
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(pts[:, :3].astype(np.float64))
        pc.colors = o3d.utility.Vector3dVector(colors.astype(np.float64))
        o3d.visualization.draw_geometries([pc])
    except ImportError:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(12, 12), facecolor="black")
        ax.scatter(pts[:, 0], pts[:, 1], s=0.3, c=colors, linewidths=0)
        ax.set_aspect("equal")
        ax.set_facecolor("black")
        ax.set_xlim(-60, 60)
        ax.set_ylim(-60, 60)
        ax.axis("off")
        fig.savefig(args.out, dpi=150, bbox_inches="tight",
                    facecolor="black")
        print(f"open3d unavailable; saved BEV render to {args.out}")


if __name__ == "__main__":
    main()
