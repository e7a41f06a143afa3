"""E2E smoke tests for the range-view family (CENet, SalsaNext) + the
projection/aug pipeline, hermetic on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openpcseg_tpu.config import CfgDict
from openpcseg_tpu.data.range_view import (
    range_mix,
    range_paste,
    range_project,
    range_shift,
    range_union,
    pack_scan_tensor,
    synthetic_range_batch,
)
from openpcseg_tpu.engine import SegTask

H, W, NUM_CLASS = 16, 128, 20


def range_cfgs(name):
    return CfgDict({
        "MODALITY": "range",
        "DATA": {"DATASET": "semantickitti", "H": H, "W": W},
        "MODEL": {
            "NAME": name, "IGNORE_LABEL": 0, "NUM_CLASS": NUM_CLASS,
            "IF_BN": True, "LOSS": "wce", "IF_LS_LOSS": True,
            "IF_BD_LOSS": True, "TOP_K_PERCENT_PIXELS": 1.0, "IF_AUX": True,
            "LAYERS": [1, 1, 1, 1],
        },
        "OPTIM": {
            "BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 2, "OPTIMIZER": "adamw",
            "BETA1": 0.9, "BETA2": 0.999, "EPS": 5e-6,
            "LR_PER_SAMPLE": 0.002, "WEIGHT_DECAY": 0.01,
            "GRAD_NORM_CLIP": 10,
            "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1,
        },
    })


def make_batch(seed, batch=2):
    b = synthetic_range_batch(seed, batch, h=H, w=W, num_class=NUM_CLASS)
    return {k: jnp.asarray(v) for k, v in b.items()}


class TestProjection:
    def test_projection_shapes_and_zbuffer(self, rng):
        pts = rng.uniform(-40, 40, (5000, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-3, 1, 5000)
        rem = rng.random(5000).astype(np.float32)
        lab = rng.integers(0, 20, 5000).astype(np.int32)
        s = range_project(pts, rem, lab, 64, 512)
        assert s["range_img"].shape == (64, 512)
        occ = s["xyz_mask"] > 0
        # z-buffer: the stored depth must equal the MIN depth of points
        # landing in that pixel (closest wins)
        d = np.linalg.norm(pts, axis=1)
        py, px = s["proj_y"], s["proj_x"]
        for (y, x) in [(32, 100), (40, 200), (20, 400)]:
            sel = (py == y) & (px == x)
            if sel.any():
                assert np.isclose(s["range_img"][y, x], d[sel].min(), atol=1e-5)
        scan, label, mask = pack_scan_tensor(s)
        assert scan.shape == (64, 512, 6)
        np.testing.assert_array_equal(scan[..., 5], s["xyz_mask"])
        # empty pixels keep label 0
        assert (label[~occ.astype(bool)] == 0).all()

    def test_augs_preserve_shapes(self, rng):
        b = synthetic_range_batch(0, 2, h=H, w=W)
        s1 = (b["scan"][0], b["label"][0], b["mask"][0])
        s2 = (b["scan"][1], b["label"][1], b["mask"][1])
        g = np.random.default_rng(0)
        for fn in (lambda: range_mix(*s1, *s2, g),
                   lambda: range_paste(*s1, *s2),
                   lambda: range_union(*s1, *s2)):
            scan, label, mask = fn()
            assert scan.shape == s1[0].shape and label.shape == s1[1].shape

    def test_range_shift_rolls(self, rng):
        pts = rng.uniform(-40, 40, (3000, 3)).astype(np.float32)
        s = range_project(pts, rng.random(3000).astype(np.float32),
                          rng.integers(0, 20, 3000).astype(np.int32), 32, 256)
        sh = range_shift(s, 50)
        np.testing.assert_array_equal(
            sh["range_img"][:, :256 - 50], s["range_img"][:, 50:])


@pytest.mark.parametrize("name", ["CENet", "SalsaNext", "FIDNet", "RangeNet"])
def test_range_train_eval(name):
    task = SegTask(range_cfgs(name), NUM_CLASS, batch_per_device=2,
                   iters_per_epoch=20, total_epochs=2)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, make_batch(0))
    step = jax.jit(task.train_step)
    losses = []
    for i in range(10):
        state, m = step(state, make_batch(i % 3), rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    out = jax.jit(task.eval_step)(state, make_batch(0))
    hist = np.asarray(out["hist"], np.int64)
    assert hist.sum() == 2 * H * W

    # per-point eval path (p_* arrays present): hist mass = valid points
    b = make_batch(0)
    nrng = np.random.default_rng(0)
    npnt = 500
    b["p_label"] = jnp.asarray(
        nrng.integers(0, NUM_CLASS, (2, npnt)).astype(np.int32))
    b["p_px"] = jnp.asarray(nrng.integers(0, W, (2, npnt)).astype(np.int32))
    b["p_py"] = jnp.asarray(nrng.integers(0, H, (2, npnt)).astype(np.int32))
    b["p_range"] = jnp.asarray(
        nrng.uniform(1, 50, (2, npnt)).astype(np.float32))
    b["p_valid"] = jnp.asarray(nrng.random((2, npnt)) < 0.8)
    out = jax.jit(task.eval_step)(state, b)
    hist = np.asarray(out["hist"], np.int64)
    assert hist.sum() == int(np.asarray(b["p_valid"]).sum())


def test_range_point_eval_knn_vs_numpy_oracle():
    """Per-point range eval: knn_postprocess vs a brute-force numpy oracle
    (reference range/utils.py:291-341 semantics)."""
    import numpy as np
    import jax.numpy as jnp
    from openpcseg_tpu.ops.range_knn import knn_postprocess

    rng = np.random.default_rng(0)
    h, w, n, nc = 16, 32, 200, 6
    proj_range = rng.uniform(1, 50, (h, w)).astype(np.float32)
    proj_range[rng.random((h, w)) < 0.3] = 0.0  # empty pixels
    pred = rng.integers(0, nc, (h, w)).astype(np.int32)
    p_range = rng.uniform(1, 50, n).astype(np.float32)
    px = rng.integers(0, w, n).astype(np.int32)
    py = rng.integers(0, h, n).astype(np.int32)
    valid = rng.random(n) < 0.9

    k, search, cutoff = 5, 5, 1.0
    got = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(pred), jnp.asarray(p_range),
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid),
        num_class=nc, k=k, search=search, cutoff=cutoff))

    off = search // 2
    for i in range(n):
        if not valid[i]:
            assert got[i] == 0
            continue
        cand = []
        for dy in range(-off, off + 1):
            for dx in range(-off, off + 1):
                y, x = py[i] + dy, px[i] + dx
                if 0 <= y < h and 0 <= x < w and proj_range[y, x] > 0:
                    cand.append((abs(proj_range[y, x] - p_range[i]),
                                 pred[y, x]))
        cand.sort(key=lambda t: t[0])
        votes = np.zeros(nc)
        for d, l in cand[:k]:
            if d <= cutoff:
                votes[l] += 1
        if votes.sum() > 0:
            best = votes.max()
            winners = {c for c in range(nc) if votes[c] == best}
            assert got[i] in winners, i
        else:
            assert got[i] == pred[py[i], px[i]], i
