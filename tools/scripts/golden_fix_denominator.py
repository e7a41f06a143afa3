"""Backfill the GT-present-denominator mIoU curve into golden JSONs.

Runs produced before golden_run.py recorded `val_miou_curve` with the
fixed GT-present denominator only have the union-denominator (nanmean)
curve, which swings when classes absent from the tiny surrogate val
set's GT flip between nan (excluded) and 0.0 (a few stray predictions).
GT presence is recoverable from the recorded per-class IoU: a class that
is nan at ANY eval point has zero GT AND zero predictions there, and the
val set (hence GT) is fixed across evals — so any-step-nan == GT-absent
(a GT-present class always has union > 0, never nan).

Usage: python tools/scripts/golden_fix_denominator.py GOLDEN_r04_*.json
"""
import json
import math
import sys


def fix(path):
    with open(path) as f:
        d = json.load(f)
    if "val_miou_union_denom_curve" in d:
        print(f"{path}: already has both curves, skipping")
        return
    pc = dict((int(s), ious) for s, ious in d["val_perclass_iou"])
    steps = sorted(pc)
    nc = len(pc[steps[0]])
    isnan = lambda v: isinstance(v, float) and math.isnan(v)
    gt_absent = {c for c in range(nc)
                 if any(isnan(pc[s][c]) for s in steps)}
    fixed = []
    for s in steps:
        vals = [pc[s][c] for c in range(nc)
                if c not in gt_absent and not isnan(pc[s][c])]
        fixed.append([s, sum(vals) / len(vals)])
    d["val_miou_union_denom_curve"] = d["val_miou_curve"]
    d["val_miou_curve"] = fixed
    d["final_val_miou"] = fixed[-1][1]
    d["gt_absent_classes"] = sorted(gt_absent)
    d["denominator_note"] = (
        "val_miou_curve backfilled to the fixed GT-present-class "
        "denominator (golden_fix_denominator.py); the original "
        "union>0 nanmean curve (which swings when GT-absent classes "
        "flip between nan and 0.0) is kept as "
        "val_miou_union_denom_curve")
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    print(f"{path}: gt_absent={sorted(gt_absent)} "
          f"final {fixed[-1][1]:.2f} (was {d['val_miou_union_denom_curve'][-1][1]:.2f})")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        fix(p)
