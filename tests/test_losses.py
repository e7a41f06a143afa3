"""Loss-layer unit tests: values, masking, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpcseg_tpu.losses import Losses, cross_entropy, lovasz_softmax
from openpcseg_tpu.losses.longtail import eqlv2_loss, group_softmax_loss


@pytest.fixture
def fake(rng):
    n, c = 400, 23
    logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    valid = jnp.asarray(rng.random(n) > 0.1)
    return logits, labels, valid


def test_ce_matches_manual(fake):
    logits, labels, valid = fake
    got = float(cross_entropy(logits, labels, valid, ignore_index=0))
    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    lab, val = np.asarray(labels), np.asarray(valid)
    m = val & (lab != 0)
    expect = -lp[np.arange(len(lab)), lab][m].mean()
    assert np.isclose(got, expect, rtol=1e-5)


def test_ce_ignores_padding(fake):
    logits, labels, valid = fake
    a = float(cross_entropy(logits, labels, valid))
    # corrupting invalid lanes must not change the loss
    bad = jnp.where(valid[:, None], logits, 1e6)
    b = float(cross_entropy(bad, labels, valid))
    assert np.isclose(a, b, rtol=1e-5)


def test_lovasz_padding_invariance(fake):
    logits, labels, valid = fake
    p = jax.nn.softmax(logits, -1)
    a = float(lovasz_softmax(p, labels, valid))
    p_bad = jnp.where(valid[:, None], p, 0.123)
    b = float(lovasz_softmax(p_bad, labels, valid))
    assert np.isclose(a, b, rtol=1e-5)
    assert 0.0 < a < 1.0


@pytest.mark.parametrize("types", [
    ["CELoss", "LovLoss"], ["WCELoss"], ["FocalLoss"], ["DiceLossV0"],
    ["ELLLoss"], ["EQLv2"], ["GroupSoftmax"],
])
def test_dispatcher_grads(fake, types):
    logits, labels, valid = fake
    kw = {}
    if types == ["WCELoss"]:
        kw["cls_num_pts"] = np.arange(1, 24, dtype=np.float32)
    crit = Losses(types, [1.0] * len(types), ignore_index=0, **kw)
    g = jax.grad(lambda lg: crit(lg, labels, valid))(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    v = float(crit(logits, labels, valid))
    assert np.isfinite(v) and v > 0


def test_sgd_fc_scales_classifier_lr():
    """sgd_fc applies 10x LR to classifier params (reference
    pcseg/optim/__init__.py:24-34); everything else matches plain sgd."""
    import jax.numpy as jnp
    from openpcseg_tpu.config import CfgDict
    from openpcseg_tpu.optim import build_optimizer

    params = {
        "backbone": {"kernel": jnp.ones((3,))},
        "classifier": {"kernel": jnp.ones((3,)), "bias": jnp.ones((2,))},
    }
    grads = jax.tree.map(jnp.ones_like, params)

    def one_step(opt_name):
        cfg = CfgDict({"OPTIMIZER": opt_name, "LR": 0.1,
                       "SCHEDULER": "none", "MOMENTUM": 0.0,
                       "WEIGHT_DECAY": 0.0})
        tx, _ = build_optimizer(cfg, 10, 1)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        return upd

    u_sgd = one_step("sgd")
    u_fc = one_step("sgd_fc")
    np.testing.assert_allclose(
        np.asarray(u_fc["backbone"]["kernel"]),
        np.asarray(u_sgd["backbone"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(u_fc["classifier"]["kernel"]),
        10.0 * np.asarray(u_sgd["classifier"]["kernel"]), rtol=1e-6)
