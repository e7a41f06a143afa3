"""Speed-of-light decomposition of the MinkUNet bench step (VERDICT r4 #1).

Models the per-step cost floor of the current TPU design from first
principles, per conv: useful MXU FLOPs (2*hits*Cin*Cout), the pallas
kernel's one-hot gather FLOPs (items * 2*BLK*WIN*3C — the price of
expressing a sparse gather as an MXU matmul), window DMA bytes, w3-table
staging traffic, and the measured ~1.5 us per-item dispatch stall
(tools/perf probes, round 3). Compares the summed floors against the
measured step time and against an A100 resource-scaled bound.

Run on CPU (no TPU needed): the plans depend only on the kernel maps.

  JAX_PLATFORMS=cpu python tools/perf/sol_model.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
from openpcseg_tpu.utils.cache import pin_cpu_platform  # noqa: E402
pin_cpu_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import mk_cfgs  # noqa: E402
from openpcseg_tpu.engine import SegTask  # noqa: E402

# v5e (lite) chip constants
PEAK_TFLOPS = 197e12          # bf16 MXU
HBM_GBS = 819e9               # sequential HBM
ITEM_STALL_US = 1.5           # measured per (column, window) item stall
BLK = WIN = 512               # production kernel sizes (BASELINE.md A/Bs)

# A100 constants for the resource-scaling comparison
A100_TFLOPS = 312e12
A100_HBM_GBS = 2039e9
A100_SCANS_PER_S = 7.97       # BASELINE.md derivation


def main():
    n_pts, cap = 131072, 98304
    cfgs = mk_cfgs(cap)
    task = SegTask(cfgs, num_class=20, batch_per_device=1,
                   iters_per_epoch=19130)

    from openpcseg_tpu.data.raycast import raycast_batch
    batch = {k: jnp.asarray(v)
             for k, v in raycast_batch(0, 1, cap=n_pts).items()}
    state = task.init_state(jax.random.PRNGKey(0), batch)
    vb, pyr = task.preprocess(batch)

    # ---- per-conv inventory (hits, cin, cout, n_rows, k) ----
    _, cols = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vb.voxel_feats, pyr, train=False, mutable=["flops", "convinfo"])
    rows = [np.asarray(leaf).reshape(-1, 5)
            for leaf in jax.tree_util.tree_leaves(cols["convinfo"])]
    convs = np.concatenate(rows, axis=0)  # [nconv, 5]

    # ---- per-level plan item counts (k3 subm kernel maps) ----
    from openpcseg_tpu.ops.kmap import kernel_offsets
    from openpcseg_tpu.ops.pallas_conv import build_window_plan
    from openpcseg_tpu.ops.sparse_conv import _plan_key

    key3 = _plan_key(kernel_offsets(3))
    items_by_n = {}
    for lvl in pyr.levels:
        if lvl.subm_kmap is None:
            continue
        n = int(lvl.subm_kmap.shape[1])
        plan = build_window_plan(lvl.subm_kmap, key3, blk=BLK, win=WIN,
                                 gsize=1)
        items_by_n[n] = float(np.asarray(jnp.sum(plan["wcnt"])))
        print(f"level n={n}: occ={int(np.sum(np.asarray(lvl.valid)))} "
              f"items={items_by_n[n]:.0f} "
              f"(blocks={plan['wcnt'].shape[1]} x cols=9, "
              f"mean windows/block="
              f"{items_by_n[n] / plan['wcnt'].shape[1] / 9:.2f})")

    # ---- cost model ----
    tot = dict(useful=0.0, onehot=0.0, dma=0.0, w3=0.0, items=0.0,
               feats_rw=0.0)
    for hits, cin, cout, n, k in convs:
        cin, cout, n, k = int(cin), int(cout), int(n), int(k)
        tot["useful"] += 2.0 * hits * cin * cout
        # every conv at minimum reads feats and writes out once (bf16)
        tot["feats_rw"] += 2.0 * n * (cin + cout)
        if k == 27 and cin >= 16 and n in items_by_n:
            it = items_by_n[n]
            tot["items"] += it
            # one-hot gather dot [BLK, WIN] @ [WIN, 3cin] per item, plus the
            # masked weight dot [BLK, 3cin] @ [3cin, cout]
            tot["onehot"] += it * 2.0 * BLK * WIN * 3 * cin
            tot["useful"] += it * 2.0 * BLK * 3 * cin * cout \
                - 2.0 * hits * cin * cout  # replaces the hit-exact count
            tot["dma"] += it * WIN * 3 * cin * 2.0
            tot["w3"] += n * cin * 2.0 * 4   # read feats 3x + write [n,3cin]

    fwd_mult = 1.0
    bwd_mult = 2.0   # dfeats kernel (dout windows) + dW from the same pass
    scale = fwd_mult + bwd_mult

    t_mxu = scale * (tot["useful"] + tot["onehot"]) / PEAK_TFLOPS
    t_dma = scale * (tot["dma"] + tot["w3"] + tot["feats_rw"]) / HBM_GBS
    t_stall = scale * tot["items"] * ITEM_STALL_US * 1e-6

    print(f"\nconvs: {len(convs)}  "
          f"useful fwd GFLOP: {tot['useful'] / 1e9:.1f}  "
          f"one-hot fwd GFLOP: {tot['onehot'] / 1e9:.1f}  "
          f"window DMA fwd MB: {tot['dma'] / 1e6:.1f}  "
          f"items/step fwd: {tot['items']:.0f}")
    print(f"modeled floors (x{scale:.0f} for fwd+bwd):")
    print(f"  MXU  (useful + one-hot) : {t_mxu * 1e3:7.1f} ms")
    print(f"  HBM  (windows + w3 + io): {t_dma * 1e3:7.1f} ms")
    print(f"  item stalls @1.5us      : {t_stall * 1e3:7.1f} ms")
    floor = max(t_mxu, t_dma) + t_stall
    print(f"  conv-path floor (max(MXU, HBM) + stalls): {floor * 1e3:.1f} ms")

    # A100 resource scaling of the reference throughput
    by_flops = A100_SCANS_PER_S * PEAK_TFLOPS / A100_TFLOPS
    by_bw = A100_SCANS_PER_S * HBM_GBS / A100_HBM_GBS
    print(f"\nA100-resource-scaled reference rate on this chip: "
          f"{by_bw:.2f} (HBM-scaled) .. {by_flops:.2f} (FLOP-scaled) "
          f"scans/s/chip")


if __name__ == "__main__":
    main()
