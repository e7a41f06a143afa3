"""Training CLI — mirrors the reference entry point surface
(reference: train.py:55-110 parse_config, :546-563 main):

    python train.py --cfg_file tools/cfgs/voxel/semantic_kitti/minkunet_mk34_cr10.yaml

The --launcher/dist flags of the reference are replaced by the device mesh:
all visible chips are used data-parallel (--num_devices to restrict).
"""
from __future__ import annotations

import argparse

import numpy as np

from openpcseg_tpu.config import CfgDict, cfg_from_list, cfg_from_yaml_file
from openpcseg_tpu.engine.trainer import Trainer


def parse_config():
    parser = argparse.ArgumentParser(description="OpenPCSeg-TPU training")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=0,
                        help="per-device batch size (default: from cfg)")
    parser.add_argument("--epochs", type=int, default=0)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckp", type=str, default=None)
    parser.add_argument("--pretrained_ckp", type=str, default=None,
                        help="shape-tolerant partial init from a saved "
                             "checkpoint (fine-tune workflows)")
    parser.add_argument("--log_dir", type=str, default="logs")
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_devices", type=int, default=0,
                        help="0 = all visible devices")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--eval_interval", type=int, default=1)
    parser.add_argument("--ckp_save_interval", type=int, default=1)
    parser.add_argument("--max_ckp_save_num", type=int, default=5)
    parser.add_argument("--log_interval", type=int, default=50)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of training steps "
                             "here (viewable in TensorBoard/xprof)")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                        default=None, help="dotted-key config overrides")
    args = parser.parse_args()

    cfgs = CfgDict()
    cfg_from_yaml_file(args.cfg_file, cfgs)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfgs)
    return args, cfgs


def main():
    args, cfgs = parse_config()
    from openpcseg_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from openpcseg_tpu.parallel import init_distributed
    init_distributed()  # multi-host pods (reference init_dist_*, no-op local)
    np.random.seed(args.seed)  # (reference --fix_random_seed, train.py:254-255)
    trainer = Trainer(args, cfgs)
    if args.eval:
        # build steps/state from the first val batch, then evaluate
        for batch in trainer.val_loader:
            db = trainer._device_batch(batch)
            trainer._compile_steps(db)
            trainer.init_or_resume(db)
            break
        trainer.evaluate(prefix="val")
    else:
        trainer.train()


if __name__ == "__main__":
    main()
