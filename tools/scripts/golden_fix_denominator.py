"""Backfill the GT-present-denominator mIoU curve into golden JSONs.

Runs produced before golden_run.py recorded `val_miou_curve` with the
fixed GT-present denominator only have the union-denominator (nanmean)
curve, which swings when classes absent from the tiny surrogate val
set's GT flip between nan (excluded) and 0.0 (a few stray predictions).

GT presence is a property of the (deterministic) surrogate val set, so
the default mode recomputes it EXACTLY by regenerating the val scans'
labels (data/raycast.py, seeds 10_000+vs — matches run_surrogate). The
r4 version of this script instead inferred GT-absence as "per-class IoU
is nan at any eval step", which under-detects for models that always
emit a few stray predictions of an absent class (never nan): that bug
depressed SPVCNN 64.3->45.9 and RPVNet 71.3->50.9 in GOLDEN_r04 and
manufactured the model-rank "inversion" (VERDICT r4 weak #5) — with the
true GT denominator the voxel flagships cluster (mink 65.8 / spv 64.3 /
rpv 71.3), matching the reference's real-data clustering.

Usage: python tools/scripts/golden_fix_denominator.py GOLDEN_*.json
       (add --nan-heuristic to use the old inference instead of
        regenerating the val labels)
"""
import json
import math
import sys


def gt_present_from_data(n_val: int, num_class: int = 20):
    """Regenerate the deterministic val scans and read off GT presence
    (cropped to the evaluated classes 1..num_class-1)."""
    import numpy as np

    from openpcseg_tpu.data.raycast import raycast_scan

    present = np.zeros(num_class, bool)
    for vs in range(n_val):
        _, _, lab = raycast_scan((10_000 + vs) * 1000)
        present[np.unique(np.clip(lab, 0, num_class - 1))] = True
    return present[1:num_class]


def fix(path, nan_heuristic=False):
    with open(path) as f:
        d = json.load(f)
    pc = dict((int(s), ious) for s, ious in d["val_perclass_iou"])
    steps = sorted(pc)
    nc = len(pc[steps[0]])
    isnan = lambda v: v is None or (isinstance(v, float) and math.isnan(v))
    if nan_heuristic:
        gt_absent = {c for c in range(nc)
                     if any(isnan(pc[s][c]) for s in steps)}
    else:
        present = gt_present_from_data(int(d.get("n_val_scans", 16)))
        assert len(present) == nc, (len(present), nc)
        gt_absent = {c for c in range(nc) if not present[c]}
    fixed = []
    for s in steps:
        vals = [pc[s][c] for c in range(nc)
                if c not in gt_absent and not isnan(pc[s][c])]
        fixed.append([s, sum(vals) / len(vals)])
    if "val_miou_union_denom_curve" not in d:
        d["val_miou_union_denom_curve"] = d["val_miou_curve"]
    d["val_miou_curve"] = fixed
    d["final_val_miou"] = fixed[-1][1]
    d["gt_absent_classes"] = sorted(gt_absent)
    d["denominator_note"] = (
        "val_miou_curve backfilled to the fixed GT-present-class "
        "denominator (golden_fix_denominator.py, data-derived GT set); "
        "the original union>0 nanmean curve (which swings when GT-absent "
        "classes flip between nan and 0.0) is kept as "
        "val_miou_union_denom_curve")
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    print(f"{path}: gt_absent={sorted(gt_absent)} "
          f"final {fixed[-1][1]:.2f} "
          f"(union {d['val_miou_union_denom_curve'][-1][1]:.2f})")


if __name__ == "__main__":
    args = [p for p in sys.argv[1:] if p != "--nan-heuristic"]
    use_nan = "--nan-heuristic" in sys.argv
    sys.path.insert(0, ".")
    for p in args:
        fix(p, nan_heuristic=use_nan)
