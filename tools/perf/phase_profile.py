"""Phase-level profile of the MinkUNet train step on the real chip.

Times preprocess / forward / backward / full-train-step marginally (two
scan lengths, difference quotient) to cancel the ~27 ms per-call axon
dispatch overhead.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data.raycast import raycast_batch
from openpcseg_tpu.engine import SegTask


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


def marginal(loop_builder, short=2, long=6):
    fs = jax.jit(loop_builder(short))
    fl = jax.jit(loop_builder(long))
    for f in (fs, fl):
        jax.device_get(jax.tree.leaves(f())[0].ravel()[0])
    ts = []
    for f in (fs, fl, fs, fl):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(f())[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return ((ts[1] - ts[0]) + (ts[3] - ts[2])) / 2 / (long - short)


def main():
    from openpcseg_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform != "cpu"
    batch, cap = 1, 98304
    cfgs = mk_cfgs(cap)
    task = SegTask(
        cfgs, num_class=20, batch_per_device=batch,
        iters_per_epoch=19130,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    bd = {k: jnp.asarray(v)
          for k, v in raycast_batch(0, batch, cap=131072).items()}
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, bd)

    # 1. preprocess only (voxelize + geometry)
    def pp_loop(n):
        def f():
            def body(c, _):
                vb, pyr = task.preprocess(bd)
                # fold a geometry output back into a fake dependency
                return c + pyr.level_counts[0], None
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                  length=n)
            return out
        return f

    t_pp = marginal(pp_loop)
    print(f"preprocess (voxelize+geometry): {t_pp*1e3:8.2f} ms")

    # 2. preprocess + forward (no grad)
    def fwd_loop(n):
        def f():
            def body(c, _):
                vb, pyr = task.preprocess(bd)
                out = task.model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    task._model_inputs(vb, bd), pyr, train=False,
                )
                return c + out.sum(), None
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=n)
            return out
        return f

    t_fwd = marginal(fwd_loop)
    print(f"preprocess + forward:           {t_fwd*1e3:8.2f} ms "
          f"(forward ~ {(t_fwd-t_pp)*1e3:.2f})")

    # 3. full train step
    def ts_loop(n):
        def f():
            def body(carry, _):
                st, r = carry
                st2, m = task.train_step(st, bd, r)
                return (st2, r), m["loss"]
            (_, _), losses = jax.lax.scan(body, (state, rng), None, length=n)
            return losses
        return f

    t_ts = marginal(ts_loop)
    print(f"full train step:                {t_ts*1e3:8.2f} ms "
          f"(bwd+opt ~ {(t_ts-t_fwd)*1e3:.2f})")


if __name__ == "__main__":
    main()
