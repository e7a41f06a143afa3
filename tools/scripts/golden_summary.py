"""Aggregate golden curves into decision-grade acceptance stats
(VERDICT r4 #3b: multi-seed mean +- spread + recorded thresholds).

Reads GOLDEN_r04_<model>.json (seed 0) and GOLDEN_r05_<model>_s<k>.json,
computes per run the TAIL MEAN (mean val mIoU over the last `TAIL` evals —
single-eval points are noisy on the 16-scan surrogate val set; the tail
mean is the acceptance statistic), then per model the across-seed mean,
half-range spread, and a regression threshold:

    threshold = min(seed tail means) - max(5.0, spread)

A future run whose tail mean falls below the threshold is a regression the
gate must catch; anything above is within established seed noise.

  python tools/scripts/golden_summary.py            # writes the summary
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
TAIL = 3
MODELS = ["minkunet", "spvcnn", "cylinder", "rpvnet",
          "cenet", "fidnet", "rangenet", "salsanext"]


def tail_stats(path: str):
    d = json.load(open(path))
    curve = d["val_miou_curve"]
    vals = [v for _, v in curve[-TAIL:]]
    return {
        "file": os.path.basename(path),
        "seed": d.get("seed", 0),
        "lr_scale": d.get("lr_scale", 1.0),
        "tail_mean": round(float(np.mean(vals)), 2),
        "tail_std": round(float(np.std(vals)), 2),
        "final": round(float(curve[-1][1]), 2),
        "best": round(float(max(v for _, v in curve)), 2),
    }


def collect(patterns):
    """{model: [tail_stats...]} over the given glob patterns ({m} slot)."""
    by_model = {}
    for m in MODELS:
        runs = []
        for pat in patterns:
            for f in sorted(glob.glob(os.path.join(ROOT, pat.format(m=m)))):
                runs.append(tail_stats(f))
        if runs:
            by_model[m] = runs
    return by_model


def summarize(by_model, out_key, out, title):
    rows = []
    for m, runs in by_model.items():
        means = [r["tail_mean"] for r in runs]
        spread = (max(means) - min(means)) / 2 if len(means) > 1 else None
        thr = round(min(means) - max(5.0, (spread or 0.0) * 2), 2)
        out[out_key][m] = {
            "runs": runs,
            "tail_mean_across_seeds": round(float(np.mean(means)), 2),
            "half_range": None if spread is None else round(spread, 2),
            "accept_threshold": thr,
        }
        sp = "—" if spread is None else f"±{spread:.1f}"
        rows.append(f"| {m} | {len(runs)} | {np.mean(means):.1f} {sp} "
                    f"| {max(r['best'] for r in runs):.1f} | {thr:.1f} |")
    if rows:
        print(f"\n{title}")
        print("| model | runs | tail mIoU mean±spread | best | accept ≥ |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(r)


def main():
    out = {"tail_evals": TAIL, "models": {}, "models_legacy_allwarmup": {},
           "lr_probes": [],
           "note": ("'models' = fixed LR protocol (10% warmup + cosine "
                    "decay; GOLDEN_r05f_*). 'models_legacy_allwarmup' = "
                    "pre-r5 protocol whose 800 steps were ALL warmup (LR "
                    "maximal at the final eval — root cause of the range-"
                    "model tail swings; kept for history only). Acceptance "
                    "thresholds come from the fixed protocol. Surrogate "
                    "mIoU is a WITHIN-model regression gate, not a cross-"
                    "model ranking: the data-derived GT-present denominator "
                    "is per-pipeline (voxel models score 15-16 classes incl. "
                    "rare ones; cylinder/range projections crop rare-class "
                    "points -> 10-12 common classes, inflating their "
                    "absolute numbers).")}
    summarize(collect(["GOLDEN_r05f_{m}_s*.json"]), "models", out,
              "Fixed protocol (10% warmup + cosine decay):")
    summarize(collect(["GOLDEN_r04_{m}.json", "GOLDEN_r05_{m}_s*.json"]),
              "models_legacy_allwarmup", out,
              "Legacy all-warmup protocol (history):")
    for f in sorted(glob.glob(os.path.join(ROOT, "GOLDEN_r05_*_lr*.json"))):
        out["lr_probes"].append(tail_stats(f))

    with open(os.path.join(ROOT, "GOLDEN_r05_summary.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    if out["lr_probes"]:
        print("\nCENet LR probes (seed 0):")
        for p in out["lr_probes"]:
            print(f"  lr_scale={p['lr_scale']}: tail {p['tail_mean']} "
                  f"± {p['tail_std']} (best {p['best']})")
    print("\nwrote GOLDEN_r05_summary.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
