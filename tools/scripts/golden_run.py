"""Golden-metric acceptance run: MinkUNet convergence with val mIoU curve.

The reference's de-facto acceptance test is SemanticKITTI val mIoU
(70.04 for MinkUNet mk34_cr10, reference README.md:93). With the real
dataset present, this drives the full Trainer on it; without (this box has
no dataset), it runs the ray-cast surrogate — surface-realistic procedural
scans with SemanticKITTI-like class structure (openpcseg_tpu/data/raycast)
— and records the full loss + held-out mIoU trajectory to GOLDEN_r{N}.json,
demonstrating end-to-end learning dynamics on realistic point statistics.

Usage:
  python tools/scripts/golden_run.py                       # surrogate
  python tools/scripts/golden_run.py --data_path <kitti>   # real data
  (surrogate knobs) --steps 2000 --eval_every 400 --out GOLDEN_r02.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def run_real(args):
    """Real-data path: the standard CLI training entry (one command once a
    dataset exists). Reference protocol: tools/cfgs voxel MinkUNet."""
    import subprocess

    cmd = [
        sys.executable, "train.py",
        "--cfg_file", "tools/cfgs/voxel/semantic_kitti/minkunet_mk34_cr10.yaml",
        "--extra_tag", "golden", "--log_interval", "20",
        "--set", "DATA.DATA_PATH", args.data_path,
    ]
    if args.epochs:
        cmd += ["--epochs", str(args.epochs)]
    raise SystemExit(subprocess.call(cmd))


def run_surrogate(args):
    import jax
    import jax.numpy as jnp

    from openpcseg_tpu.config import CfgDict
    from openpcseg_tpu.data.raycast import raycast_batch
    from openpcseg_tpu.engine import SegTask
    from openpcseg_tpu.utils import miou_from_hist
    from openpcseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfgs = CfgDict({
        "DATA": {"DATASET": "semantickitti", "VOXEL_SIZE": 0.05},
        "MODEL": {
            "NAME": "MinkUNet", "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 4,
            "BLOCK": "ResBlock", "NUM_LAYER": [2, 3, 4, 6, 2, 2, 2, 2],
            "PLANES": [32, 32, 64, 128, 256, 256, 128, 96, 96],
            "cr": args.cr, "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.1,
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 36, "OPTIMIZER": "sgd",
            "LR_PER_SAMPLE": 0.02, "WEIGHT_DECAY": 0.0001, "MOMENTUM": 0.9,
            "NESTEROV": True, "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": 98304},
    })
    on_tpu = jax.devices()[0].platform != "cpu"
    num_class = 20
    task = SegTask(cfgs, num_class=num_class, batch_per_device=1,
                   iters_per_epoch=args.steps, total_epochs=1,
                   compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    # ray-casting is host-side numpy (~0.5 s/scan): generate each scan ONCE
    # up front and keep it host-resident; the loop only transfers
    cache_f = f"/tmp/golden_scans_{args.n_train}.npz"
    t0 = time.time()
    if os.path.exists(cache_f):
        z = np.load(cache_f)
        host = {int(k): {kk: z[f"{k}_{kk}"] for kk in
                         ("xyz", "feats", "labels", "valid")}
                for k in {n.split("_")[0] for n in z.files}}
    else:
        host = {}
        for seed in list(range(args.n_train)) + [10_000 + v
                                                 for v in range(16)]:
            host[seed] = raycast_batch(seed, 1, cap=131072)
            if len(host) % 32 == 0:
                print(f"generated {len(host)} scans "
                      f"({time.time()-t0:.0f}s)", flush=True)
        np.savez(cache_f, **{f"{s}_{k}": v for s, b in host.items()
                             for k, v in b.items()})
    print(f"scan cache ready ({time.time()-t0:.0f}s)", flush=True)

    def batch_for(seed):
        return {k: jnp.asarray(v) for k, v in host[seed].items()}

    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch_for(0))
    step = jax.jit(task.train_step, donate_argnums=(0,))
    estep = jax.jit(task.eval_step)

    n_train, n_val = args.n_train, 16
    losses, curve = [], []
    t0 = time.time()
    pend = []
    for it in range(args.steps):
        state, m = step(state, batch_for(it % n_train), rng)
        pend.append(m["loss"])
        if (it + 1) % 50 == 0:
            losses.append(
                (it + 1, float(np.mean(jax.device_get(pend)))))
            pend.clear()
            print(f"step {it+1}: loss {losses[-1][1]:.4f} "
                  f"({(time.time()-t0)/(it+1)*1e3:.0f} ms/step)", flush=True)
        if (it + 1) % args.eval_every == 0 or it + 1 == args.steps:
            hist = np.zeros((num_class, num_class), np.int64)
            for vs in range(n_val):
                out = estep(state, batch_for(10_000 + vs))
                hist += np.asarray(jax.device_get(out["hist"]), np.int64)
            miou, per = miou_from_hist(hist, np.arange(num_class - 1))
            curve.append((it + 1, float(miou)))
            print(f"step {it+1}: val mIoU {miou:.2f}", flush=True)

    payload = {
        "kind": "raycast_surrogate",
        "model": f"MinkUNet mk34 cr={args.cr}",
        "steps": args.steps,
        "n_train_scans": n_train, "n_val_scans": n_val,
        "loss_curve": losses,
        "val_miou_curve": curve,
        "final_val_miou": curve[-1][1] if curve else None,
        "wall_s": round(time.time() - t0, 1),
        "device": str(jax.devices()[0]),
        "note": ("no real SemanticKITTI on this machine; this surrogate "
                 "demonstrates full learning dynamics (loss + held-out "
                 "mIoU) on surface-realistic scans. Run this script with "
                 "--data_path to execute the real protocol."),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", args.out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=0)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--eval_every", type=int, default=400)
    ap.add_argument("--n_train", type=int, default=128)
    ap.add_argument("--cr", type=float, default=1.0)
    ap.add_argument("--out", type=str, default="GOLDEN_r02.json")
    args = ap.parse_args()
    if args.data_path:
        run_real(args)
    else:
        run_surrogate(args)


if __name__ == "__main__":
    main()
