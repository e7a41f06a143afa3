"""Compile-time story with numbers (VERDICT r4 #6).

Round 4 landed scan-over-blocks (nn.scan over the repeated residual
blocks, models/layers.py repeated_blocks) for MinkUNet/SPVCNN/RPVNet and
claimed a "compile cut" with no measurement recorded anywhere. This script
produces the table: per model, trace (jit lower) + XLA compile wall time
with OPENPCSEG_SCAN_BLOCKS=1 (default, scanned) vs =0 (unrolled), plus the
8-device dryrun_multichip wall time. Persistent compilation cache is NOT
enabled, so the numbers are honest cold-cache costs; each config runs in a
fresh subprocess because the env var is read at trace time.

  JAX_PLATFORMS=cpu python tools/perf/compile_times.py
  JAX_PLATFORMS=cpu python tools/perf/compile_times.py --models minkunet
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, REPO)

SCANNED_MODELS = ["minkunet", "spvcnn", "rpvnet"]


def child_model(model: str) -> None:
    """Measure one (model, OPENPCSEG_SCAN_BLOCKS) config; prints one JSON
    line. The env var must already be exported by the parent."""
    from openpcseg_tpu.utils.cache import pin_cpu_platform
    pin_cpu_platform()
    import jax
    import jax.numpy as jnp

    from openpcseg_tpu.data.raycast import raycast_batch
    from openpcseg_tpu.engine import SegTask
    from tools.scripts.golden_run import model_setup

    cfgs, transform = model_setup(model, 1.0)
    task = SegTask(cfgs, num_class=20, batch_per_device=1,
                   iters_per_epoch=100)
    host = raycast_batch(0, 1, cap=131072)
    batch = {k: jnp.asarray(v) for k, v in transform(host, 0).items()}
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch)

    t0 = time.time()
    lowered = jax.jit(task.train_step, donate_argnums=(0,)).lower(
        state, batch, rng)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(json.dumps({
        "model": model,
        "scan_blocks": os.environ.get("OPENPCSEG_SCAN_BLOCKS", "1"),
        "trace_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
    }), flush=True)


def child_dryrun() -> None:
    import __graft_entry__

    t0 = time.time()
    __graft_entry__.dryrun_multichip(8)
    print(json.dumps({"model": "dryrun_multichip(8)",
                      "scan_blocks": os.environ.get(
                          "OPENPCSEG_SCAN_BLOCKS", "1"),
                      "total_s": round(time.time() - t0, 1)}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=["model", "dryrun"], default=None)
    ap.add_argument("--model", default=None)
    ap.add_argument("--models", nargs="*", default=SCANNED_MODELS)
    ap.add_argument("--skip_dryrun", action="store_true")
    args = ap.parse_args()

    if args.child == "model":
        child_model(args.model)
        return
    if args.child == "dryrun":
        child_dryrun()
        return

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("OPENPCSEG_JAX_CACHE", None)
    rows = []

    def run(extra_args, scan):
        e = {**env, "OPENPCSEG_SCAN_BLOCKS": scan}
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + extra_args,
            env=e, capture_output=True, text=True, timeout=3600)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1:]
        if not line:
            print(f"FAILED {extra_args} scan={scan}:\n{p.stderr[-2000:]}")
            return
        rows.append(json.loads(line[0]))
        print(line[0], flush=True)

    for m in args.models:
        for scan in ("1", "0"):
            run(["--child", "model", "--model", m], scan)
    if not args.skip_dryrun:
        run(["--child", "dryrun"], "1")

    print("\n| model | scan_blocks | trace s | compile s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['model']} | {r['scan_blocks']} "
              f"| {r.get('trace_s', '—')} "
              f"| {r.get('compile_s', r.get('total_s'))} |")


if __name__ == "__main__":
    main()
