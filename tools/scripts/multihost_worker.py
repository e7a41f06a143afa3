"""One process of the multi-host DP dry run (spawned by
__graft_entry__.dryrun_multihost / tests/test_multihost.py).

Each worker owns `devs` virtual CPU devices and only its slice of every
global batch (exactly what BatchLoader yields per host); the global batch
array is assembled with jax.make_array_from_process_local_data
(parallel/mesh.py global_batch_arrays) and one shard_map DP train step runs
over the full 2-host mesh with gloo CPU collectives. Verifies the wiring
the reference gets from DistributedSampler + DDP/NCCL
(tools/utils/common/common_utils.py:131-175).

Usage: python multihost_worker.py <num_processes> <process_id> <port> <devs>
"""
import os
import sys


def main():
    nproc, pid, port, devs = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], int(sys.argv[4]))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    n_global = nproc * devs
    assert jax.device_count() == n_global, jax.device_count()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import numpy as np
    from __graft_entry__ import _cfgs
    from openpcseg_tpu.data import synthetic_batch
    from openpcseg_tpu.engine import SegTask
    from openpcseg_tpu.parallel import make_data_mesh, shard_train_step
    from openpcseg_tpu.parallel.mesh import global_batch_arrays

    n_pts = 512
    cfgs = _cfgs(voxel_cap_per_scan=512, planes_scale=0.25)
    cfgs.MODEL.NUM_LAYER = [1, 1, 1, 1, 1, 1, 1, 1]
    cfgs.TPU.VOXEL_CAP_RATIOS = [1.0, 0.8, 0.5, 0.3, 0.2]
    task = SegTask(cfgs, num_class=20, batch_per_device=1,
                   num_devices=n_global, axis_name="data",
                   iters_per_epoch=10, total_epochs=2)
    mesh = make_data_mesh(n_global)

    # the same deterministic global batch on every process; each host slices
    # out ITS shard — the shape BatchLoader delivers per process
    gb = synthetic_batch(0, n_global, n_points=n_pts, cap=n_pts)
    local = {k: np.asarray(v)[pid * devs:(pid + 1) * devs] for k, v in gb.items()}
    db = global_batch_arrays(mesh, local)
    for v in db.values():
        assert v.shape[0] == n_global, v.shape  # global leading dim

    # init on host-local (replicated-by-construction) numpy inputs
    state = task.init_state(
        jax.random.PRNGKey(0), {k: np.asarray(v)[:1] for k, v in gb.items()})
    state = jax.device_get(state)  # uncommitted -> replicable under jit

    step = shard_train_step(task, mesh, db)
    state, metrics = step(state, db, np.asarray(jax.random.PRNGKey(1)))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss), loss
    print(f"multihost worker {pid}/{nproc}: ok, loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
