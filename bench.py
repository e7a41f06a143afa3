"""Benchmark harness: SemanticKITTI-scale MinkUNet training throughput.

North-star metric (BASELINE.json): SemanticKITTI scans/sec/chip. The
reference publishes no throughput, so the baseline is derived from its
model-zoo training time: MinkUNet mk34_cr10, 36 epochs x 19130 train scans
in ~12.0 h on 2xA100 (reference README.md:93) ->
36*19130 / (12*3600) / 2 = 7.97 scans/sec per A100 chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on the real TPU chip when available (axon platform), CPU otherwise.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data import synthetic_batch
from openpcseg_tpu.engine import SegTask

# reference A100 training throughput (see module docstring)
BASELINE_SCANS_PER_SEC_PER_CHIP = 36 * 19130 / (12.0 * 3600) / 2

# bf16 matmul peak of the bench chip, for the MFU line. TPU v5e (lite):
# 197 TFLOP/s; override via BENCH_PEAK_TFLOPS when benching elsewhere
# (v5p: 459, v4: 275).
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def mk_cfgs(voxel_cap: int):
    return CfgDict({
        "DATA": {"DATASET": "semantickitti", "VOXEL_SIZE": 0.05},
        "MODEL": {
            "NAME": "MinkUNet", "IGNORE_LABEL": 0, "IN_FEATURE_DIM": 4,
            "BLOCK": "ResBlock", "NUM_LAYER": [2, 3, 4, 6, 2, 2, 2, 2],
            "PLANES": [32, 32, 64, 128, 256, 256, 128, 96, 96],
            "cr": 1.0, "DROPOUT_P": 0.0, "LABEL_SMOOTHING": 0.1,
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 36, "OPTIMIZER": "sgd",
            "LR_PER_SAMPLE": 0.02, "WEIGHT_DECAY": 0.0001, "MOMENTUM": 0.9,
            "NESTEROV": True, "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
        "TPU": {"VOXEL_CAP_PER_SCAN": voxel_cap},
    })


def _tunnel_alive(timeout_s: int = 300) -> bool:
    """Probe device init in a subprocess: a wedged TPU tunnel blocks even
    jax.devices() indefinitely (observed outages > 9 h), which would hang
    the whole bench run; a bounded child probe fails fast instead."""
    import os
    import subprocess
    import sys

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True)
        return b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _tunnel_alive():
        print(json.dumps({
            "metric": "train_throughput", "value": 0.0,
            "unit": "scans/sec/chip", "vs_baseline": 0.0,
            "error": "tpu tunnel unreachable (device init timed out)",
        }))
        return
    from openpcseg_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import os
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        # batch 1 measured fastest per scan on v5e (532 ms/step vs 1217 at
        # batch 2 for two scans): smaller tables gather faster.
        # BENCH_BATCH overrides for batch-size sweeps.
        batch, n_pts, voxel_cap, iters = 1, 131072, 98304, 60
        batch = int(os.environ.get("BENCH_BATCH", batch))
        iters = max(iters // batch, 10)
    else:  # CPU fallback so the harness always reports something
        batch, n_pts, voxel_cap, iters = 1, 8192, 8192, 3

    cfgs = mk_cfgs(voxel_cap)
    task = SegTask(
        cfgs, num_class=20, batch_per_device=batch,
        iters_per_epoch=19130 // batch,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    if on_tpu:
        # ray-cast surface scans: realistic LiDAR occupancy (thin surfaces,
        # range-dependent density) — the scatter-noise generator inflates
        # deep-level voxel counts ~3x vs real scans.
        # BENCH_DUP=1 duplicates scan 0 across the batch: the generator's
        # scans differ in density (scan 1 has ~1.4x scan 0's voxels), so
        # batch sweeps on distinct scans compare different workloads —
        # round 3's apparent batch-2 throughput inversion was exactly this
        # (per-voxel time at batch 2 is slightly BETTER than batch 1).
        from openpcseg_tpu.data.raycast import raycast_batch
        if os.environ.get("BENCH_DUP", "0") == "1":
            one = raycast_batch(0, 1, cap=n_pts)
            batch_data = {
                k: jnp.asarray(np.repeat(v, batch, axis=0))
                for k, v in one.items()}
        else:
            batch_data = {
                k: jnp.asarray(v)
                for k, v in raycast_batch(0, batch, cap=n_pts).items()}
    else:
        batch_data = {
            k: jnp.asarray(v)
            for k, v in synthetic_batch(
                0, batch, n_points=n_pts, cap=n_pts).items()
        }
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch_data)
    step = jax.jit(task.train_step, donate_argnums=(0,))

    # algorithmic conv FLOPs of one forward over this batch, summed from
    # the per-conv "flops" sow (models/layers.py SparseConv): data-dependent
    # (hit counts), so measured on the actual bench batch. The train step
    # does ~3x the forward's conv work (fwd + dfeats + dW); non-conv work
    # (BN, losses, geometry) is excluded, so `mfu` is a conservative
    # model-FLOPs utilization, the standard accounting.
    @jax.jit
    def _fwd_flops(state, batch):
        vb, pyr = task.preprocess(batch)
        _, cols = task.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            task._model_inputs(vb, batch), pyr, train=False,
            mutable=["flops"],
        )
        return sum(jnp.sum(leaf) for leaf in
                   jax.tree_util.tree_leaves(cols.get("flops", {})))

    # compile + warmup. NOTE: through remote-device tunnels (axon),
    # block_until_ready can return before execution completes; only a
    # device_get of a result forces real completion, so all timing
    # endpoints below use device_get.
    state, m = step(state, batch_data, rng)
    float(jax.device_get(m["loss"]))

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_data, rng)
    float(jax.device_get(m["loss"]))
    dt = time.perf_counter() - t0
    scans_per_sec = batch * iters / dt

    prof_dir = os.environ.get("BENCH_PROFILE", "")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            for _ in range(4):
                state, m = step(state, batch_data, rng)
            float(jax.device_get(m["loss"]))

    # p50 per-scan inference latency (the second half of the north-star
    # metric, BASELINE.json): single-scan eval_step, per-call device_get
    # sync so each sample is a true end-to-end latency
    fwd_flops = float(jax.device_get(_fwd_flops(state, batch_data)))
    train_flops = 3.0 * fwd_flops              # fwd + dfeats + dW
    steps_per_sec = scans_per_sec / batch
    achieved_tflops = train_flops * steps_per_sec / 1e12
    mfu = achieved_tflops / PEAK_TFLOPS

    estep = jax.jit(task.eval_step)
    out = estep(state, batch_data)
    jax.device_get(out["hist"]).sum()
    lats = []
    for _ in range(max(iters // 4, 3)):
        t0 = time.perf_counter()
        out = estep(state, batch_data)
        jax.device_get(out["hist"]).sum()
        lats.append((time.perf_counter() - t0) / batch)
    p50_ms = sorted(lats)[len(lats) // 2] * 1e3

    print(json.dumps({
        "metric": "semantickitti_minkunet_train_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC_PER_CHIP, 3),
        "p50_infer_ms_per_scan": round(p50_ms, 1),
        "model_tflops_per_step": round(train_flops / 1e12, 4),
        "tflops": round(achieved_tflops, 3),
        "mfu": round(mfu, 4),
        "peak_tflops": PEAK_TFLOPS,
    }))


if __name__ == "__main__":
    main()
