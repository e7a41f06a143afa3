"""Inference / evaluation CLI — mirrors the reference entry point
(reference: infer.py:55-110 parse_config, :412-455 evaluate-with-dump):
evaluation is the default action, and --save_pred dumps one zero-padded
.npy prediction file per scan into DATA.OUTPUT_DIR (the Waymo
sequence-inference path consumed by the visualizers, infer.py:424-438).

    python infer.py --cfg_file tools/cfgs/voxel/semantic_kitti/minkunet_mk34_cr10.yaml \
        --ckp logs/.../ckp/12
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from openpcseg_tpu.config import CfgDict, cfg_from_list, cfg_from_yaml_file
from openpcseg_tpu.engine.trainer import Trainer


def parse_config():
    parser = argparse.ArgumentParser(description="OpenPCSeg-TPU inference")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=0)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckp", type=str, default=None)
    parser.add_argument("--log_dir", type=str, default="logs")
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_devices", type=int, default=0)
    parser.add_argument("--save_pred", action="store_true",
                        help="dump per-scan .npy predictions to "
                             "DATA.OUTPUT_DIR")
    parser.add_argument("--save_raw_ids", action="store_true",
                        help="with --save_pred: remap train ids back to raw "
                             "dataset label ids (inverse LEARNING_MAP) and "
                             "write SemanticKITTI submission-format .label "
                             "files under sequences/<seq>/predictions/")
    parser.add_argument("--tta", action="store_true",
                        help="10-vote test-time-augmentation eval "
                             "(reference TTA collate path)")
    parser.add_argument("--log_interval", type=int, default=50)
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                        default=None)
    args = parser.parse_args()

    cfgs = CfgDict()
    cfg_from_yaml_file(args.cfg_file, cfgs)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfgs)
    return args, cfgs


def dump_predictions(trainer: Trainer, out_dir: Path,
                     raw_ids: bool = False) -> int:
    """Per-scan argmax dump (reference infer.py:424-438).

    raw_ids=True additionally inverts the LEARNING_MAP (train id -> raw
    dataset id, reference semantickitti_utils.py learning_map_inv) and
    writes uint32 ``sequences/<seq>/predictions/<frame>.label`` files —
    the official SemanticKITTI benchmark submission layout.
    """
    import jax

    inv_lut = None
    nusc_tokens = None
    if raw_ids:
        ds = trainer.cfgs.DATA.DATASET
        if ds in ("semantickitti", "scribblekitti"):
            from openpcseg_tpu.data.semantickitti_meta import (
                LEARNING_MAP_INV_LUT)
            inv_lut = LEARNING_MAP_INV_LUT
        elif ds == "nuscenes":
            # official nuScenes-lidarseg submission: one uint8
            # lidarseg/<split>/<sample_data_token>_lidarseg.bin per key
            # frame, raw category ids (devkit eval format)
            from openpcseg_tpu.data.nuscenes_meta import LEARNING_MAP_INV
            inv_lut = LEARNING_MAP_INV
            src = getattr(trainer.val_set, "source", trainer.val_set)
            nusc_tokens = {r["path"]: r["token"]
                           for r in getattr(src, "annos", [])}
        else:
            raise SystemExit(f"--save_raw_ids: no inverse label map for "
                             f"dataset '{ds}'")

    out_dir.mkdir(parents=True, exist_ok=True)
    pstep = jax.jit(trainer.task.predict_step)
    count = 0
    for batch in trainer.val_loader:
        db = trainer._device_batch(batch)
        preds = np.asarray(jax.device_get(pstep(trainer.state, db)))
        valid = np.asarray(batch.get("valid")) if "valid" in batch else None
        for i, name in enumerate(batch.get("name", range(len(preds)))):
            p = preds[i]
            if valid is not None:
                p = p[valid[i]]
            # keep the scan identity: <seq>_<frame>.npy from the scan path
            # (reference keeps full sequence/frame names, infer.py:424-438);
            # padded eval tails have no real scan — skip them
            parts = str(name).replace("\\", "/").split("/")
            named = len(parts) >= 3 and parts[-1].endswith(".bin")
            if str(name) == "<pad>":
                continue  # eval-padding sample (BatchLoader pad_last)
            if nusc_tokens is not None:
                tok = nusc_tokens.get(str(name))
                if tok is None:
                    continue
                pdir = out_dir / "lidarseg" / "val"
                pdir.mkdir(parents=True, exist_ok=True)
                raw = np.asarray(inv_lut)[p.astype(np.int64)].astype(np.uint8)
                raw.tofile(pdir / f"{tok}_lidarseg.bin")
            elif inv_lut is not None:
                seq = parts[-3] if named else "00"
                frame = parts[-1][:-4] if named else f"{count:06d}"
                pdir = out_dir / "sequences" / seq / "predictions"
                pdir.mkdir(parents=True, exist_ok=True)
                raw = inv_lut[p.astype(np.int64)].astype(np.uint32)
                raw.tofile(pdir / f"{frame}.label")
            else:
                fname = (f"{parts[-3]}_{parts[-1][:-4]}.npy" if named
                         else f"{count:06d}.npy")
                np.save(out_dir / fname, p.astype(np.int32))
            count += 1
    return count


def main():
    args, cfgs = parse_config()
    from openpcseg_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    np.random.seed(args.seed)

    args.eval = True
    trainer = Trainer(args, cfgs)
    for batch in trainer.val_loader:
        db = trainer._device_batch(batch)
        trainer._compile_steps(db)
        trainer.init_or_resume(db)
        break
    if args.tta:
        trainer.evaluate_tta()
    else:
        trainer.evaluate(prefix="val")

    if args.save_pred:
        out_dir = Path(cfgs.DATA.get("OUTPUT_DIR", trainer.exp_dir / "preds"))
        n = dump_predictions(trainer, out_dir, raw_ids=args.save_raw_ids)
        trainer.logger.info(f"saved {n} prediction files to {out_dir}")


if __name__ == "__main__":
    main()
