"""Long-tail losses: EQLv2 and GroupSoftmax.

Re-derivations of the reference's long-tail experiments
(reference: pcseg/loss/eqlv2.py:8-132, group_softmax.py:14-245,
group_softmax_fgbg_2.py — used for Waymo class imbalance; the default
config zoo uses CELoss+LovLoss everywhere).

Deviations (documented):
- EQLv2's gradient-guided reweighting in the reference accumulates
  positive/negative gradient statistics across iterations in module buffers
  (eqlv2.py `pos_grad`/`neg_grad`). A cross-step carry does not fit a pure
  jitted loss; this implementation computes the gradient ratio within the
  batch (same formula, batch-local statistics).
- GroupSoftmax in the reference extends the classifier head with per-group
  'others' channels (group_softmax.py:17-18). Here the per-group 'others'
  logit is derived from the standard [N, C] logits as the logsumexp of
  out-of-group classes, so any model head works unchanged.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

# Waymo class groups (reference group_softmax.py:62-67)
WAYMO_GROUPS = [
    ["CAR", "TRUCK", "BUS", "OTHER_VEHICLE"],
    ["MOTORCYCLIST", "BICYCLIST", "PEDESTRIAN", "BICYCLE", "MOTORCYCLE"],
    ["SIGN", "TRAFFIC_LIGHT", "POLE", "CONSTRUCTION_CONE"],
    ["BUILDING", "VEGETATION", "TREE_TRUNK"],
    ["CURB", "ROAD", "LANE_MARKER", "OTHER_GROUND", "WALKABLE", "SIDEWALK"],
]


def eqlv2_loss(
    logits: jax.Array,   # [N, C]
    labels: jax.Array,   # [N]
    valid: jax.Array,    # [N]
    *,
    ignore_index: int = 0,
    gamma: float = 12.0,
    mu: float = 0.8,
    alpha: float = 4.0,
) -> jax.Array:
    """Equalization loss v2: sigmoid BCE with gradient-guided per-class
    down-weighting of negative samples (reference eqlv2.py:8-132, batch-local
    statistics — see module docstring)."""
    n, c = logits.shape
    mask = valid & (labels != ignore_index) & (labels >= 0) & (labels < c)
    mf = mask.astype(jnp.float32)
    target = jax.nn.one_hot(jnp.where(mask, labels, 0), c) * mf[:, None]

    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    # batch-local positive/negative gradient magnitudes per class
    g = jnp.abs(probs - target) * mf[:, None]
    pos_grad = (g * target).sum(axis=0)
    neg_grad = (g * (1.0 - target)).sum(axis=0)
    ratio = pos_grad / jnp.maximum(neg_grad, 1e-10)
    # mapping function f (eqlv2.py map_func): sigmoid ramp
    neg_w = 1.0 / (1.0 + jnp.exp(-gamma * (ratio - mu)))
    pos_w = 1.0 + alpha * (1.0 - neg_w)

    w = target * pos_w[None, :] + (1.0 - target) * neg_w[None, :]
    bce = -(target * jax.nn.log_sigmoid(logits.astype(jnp.float32))
            + (1.0 - target) * jax.nn.log_sigmoid(-logits.astype(jnp.float32)))
    loss = (bce * w * mf[:, None]).sum() / jnp.maximum(mf.sum(), 1.0)
    return loss


def group_softmax_loss(
    logits: jax.Array,   # [N, C]
    labels: jax.Array,   # [N]
    valid: jax.Array,    # [N]
    *,
    class_names: Optional[Sequence[str]] = None,
    groups: Optional[List[List[str]]] = None,
    ignore_index: int = 0,
    beta: float = 8.0,
) -> jax.Array:
    """Group softmax over long-tail class groups (reference
    group_softmax.py:56-245): a softmax CE inside each class group with an
    'others' bucket (derived here via out-of-group logsumexp), plus a
    foreground/background group. Ignored pixels are masked."""
    n, c = logits.shape
    if class_names is None:
        from ..data.waymo import WAYMO_CLASS_NAMES
        class_names = WAYMO_CLASS_NAMES[:c]
    groups = groups if groups is not None else WAYMO_GROUPS
    name_to_id = {nm: i for i, nm in enumerate(class_names)}

    mask = valid & (labels != ignore_index) & (labels >= 0) & (labels < c)
    mf = mask.astype(jnp.float32)
    safe = jnp.where(mask, labels, 0)
    lf = logits.astype(jnp.float32)
    total = jnp.float32(0.0)

    group_ids: List[jnp.ndarray] = []
    for g in groups:
        ids = [name_to_id[nm] for nm in g if nm in name_to_id]
        if not ids:
            continue
        ids_a = jnp.asarray(ids)
        group_ids.append(ids_a)
        in_group = jnp.isin(safe, ids_a) & mask
        # per-group channels + 'others' bucket from out-of-group classes
        other = jnp.ones(c, bool).at[ids_a].set(False)
        grp_logits = lf[:, ids_a]
        others_logit = jax.nn.logsumexp(
            jnp.where(other[None, :], lf, -jnp.inf), axis=1, keepdims=True)
        ext = jnp.concatenate([grp_logits, others_logit], axis=1)
        logp = jax.nn.log_softmax(ext, axis=1)
        # target channel: position within the group, or the others bucket
        pos = jnp.argmax(safe[:, None] == ids_a[None, :], axis=1)
        tgt = jnp.where(in_group, pos, len(ids))
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        # the reference subsamples 'others' pixels at rate ~beta x #in-group
        # (group_softmax.py _prepare_for_label_remapping); equivalent in
        # expectation to down-weighting the others term:
        n_in = (in_group.astype(jnp.float32) * mf).sum()
        keep_p = jnp.clip(beta * n_in / jnp.maximum(mf.sum(), 1.0), 0.0, 1.0)
        w = jnp.where(in_group, 1.0, keep_p)
        total = total + (nll * mf * w).sum() / jnp.maximum(
            (mf * w).sum(), 1.0)

    # fg/bg group (reference group_cls[5])
    fg_ids = jnp.concatenate(group_ids[:3]) if len(group_ids) >= 3 else None
    if fg_ids is not None:
        is_fg = jnp.isin(safe, fg_ids).astype(jnp.float32)
        fg_logit = jax.nn.logsumexp(lf[:, fg_ids], axis=1)
        bg_cols = jnp.ones(c, bool).at[fg_ids].set(False)
        bg_logit = jax.nn.logsumexp(
            jnp.where(bg_cols[None, :], lf, -jnp.inf), axis=1)
        pair = jnp.stack([bg_logit, fg_logit], axis=1)
        logp = jax.nn.log_softmax(pair, axis=1)
        nll = -jnp.take_along_axis(
            logp, is_fg.astype(jnp.int32)[:, None], axis=1)[:, 0]
        total = total + (nll * mf).sum() / jnp.maximum(mf.sum(), 1.0)

    return total
