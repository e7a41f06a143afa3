"""Long-tail losses: EQLv2 and GroupSoftmax.

Re-derivations of the reference's long-tail experiments
(reference: pcseg/loss/eqlv2.py:8-132, group_softmax.py:14-245,
group_softmax_fgbg_2.py — used for Waymo class imbalance; the default
config zoo uses CELoss+LovLoss everywhere).

Two fidelity tiers:
- **Stateful EQLv2** (`eqlv2_loss` with `state=`): reproduces the
  reference's cross-iteration `pos_grad`/`neg_grad` buffers
  (eqlv2.py:24-31,86-121) as a pure-functional [C-1]x2 carry threaded
  through TrainState.loss_state, including the all-reduce across data ranks
  (dist.all_reduce -> lax.psum) and the first-iteration all-ones weights.
  Without `state=` it falls back to batch-local statistics (documented
  approximation).
- **Extended-head GroupSoftmax** (`group_softmax_loss_extended`): the real
  per-group 'others' channel formulation over a classifier head widened to
  `group_softmax_channel_num(C)` channels (reference group_softmax.py:17-18,
  131-245: layout [unused, g0_others, g0_cls..., g1_others, g1_cls...,
  fg, bg]). Enable via MODEL.EXTEND_HEAD_FOR_GROUPS (the reference never
  wires get_channel_num() into any model — its GroupSoftmax is unusable as
  shipped; here the switch works end-to-end and eval maps activations back
  with `group_softmax_activation`). The legacy `group_softmax_loss` keeps
  the head-preserving logsumexp derivation for unmodified checkpoints.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

def group_structure(class_names: Sequence[str], version: str = "bgfg"):
    """Class-id groups for the extended-head GroupSoftmax.

    version 'bgfg' (reference group_softmax.py _get_group_bgfg): two groups
    — class_names[1:14] (foreground) and class_names[14:] (background) —
    plus the final fg/bg pair; 'fine' (_get_group) uses the five semantic
    WAYMO_GROUPS. Returns (group_ids [per non-bg group], fgbg_ids [2]).
    """
    if version == "bgfg":
        group_ids = [list(range(1, min(14, len(class_names)))),
                     list(range(min(14, len(class_names)), len(class_names)))]
        fgbg_ids = [group_ids[0], group_ids[1]]
    else:
        name_to_id = {nm: i for i, nm in enumerate(class_names)}
        group_ids = [[name_to_id[nm] for nm in g if nm in name_to_id]
                     for g in WAYMO_GROUPS]
        group_ids = [g for g in group_ids if g]
        fgbg_ids = [sum(group_ids[:3], []), sum(group_ids[3:], [])]
    return group_ids, fgbg_ids


def group_softmax_channel_num(num_class: int, version: str = "bgfg") -> int:
    """Width of the extended classifier head (reference group_softmax.py
    get_channel_num: num_classes + 1 + num_group; layout
    [unused, g0_others, g0_cls..., ..., fg, bg])."""
    num_group = (2 if version == "bgfg" else 5) + 1
    return num_class + 1 + num_group


def _group_slices(group_ids: List[List[int]]):
    """(start, n_logits) per group in the extended layout, starting at 1."""
    slices = []
    start = 1
    for ids in group_ids:
        slices.append((start, len(ids) + 1))
        start += len(ids) + 1
    fgbg = (start, 2)
    return slices, fgbg


def group_softmax_loss_extended(
    ext_logits: jax.Array,   # [N, C + 1 + num_group] extended head
    labels: jax.Array,       # [N] in 0..C-1
    valid: jax.Array,        # [N]
    *,
    num_class: int,
    class_names: Optional[Sequence[str]] = None,
    version: str = "bgfg",
    ignore_index: int = 0,
    beta: float = 8.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact extended-head GroupSoftmax (reference group_softmax.py forward
    :195-219 + _remap_labels/_sample_others :147-192).

    Per non-bg group: softmax CE over [others, cls...] channels with labels
    remapped to in-group positions (others=0, ignore=-1); 'others' rows are
    subsampled to ~beta x #in-group rows — with `rng` via Bernoulli keeping
    (same expectation as the reference's randperm pick; documented
    deviation), without `rng` via an equivalent deterministic down-weight.
    Final group: fg/bg CE over all valid rows. Group losses sum.
    """
    if class_names is None:
        from ..data.waymo import WAYMO_CLASS_NAMES
        class_names = WAYMO_CLASS_NAMES[:num_class]
    group_ids, fgbg_ids = group_structure(class_names, version)
    slices, fgbg_slice = _group_slices(group_ids)
    assert ext_logits.shape[1] == fgbg_slice[0] + 2, (
        f"extended head width {ext_logits.shape[1]} != "
        f"{group_softmax_channel_num(num_class, version)}")

    lf = ext_logits.astype(jnp.float32)
    mask = valid & (labels != ignore_index) & (labels >= 0) & (
        labels < num_class)
    mf = mask.astype(jnp.float32)
    safe = jnp.where(mask, labels, 0)
    total = jnp.float32(0.0)

    for gi, (ids, (start, n_log)) in enumerate(zip(group_ids, slices)):
        if not ids:  # empty group still owns its 'others' channel in the
            continue  # layout but contributes no loss
        ids_a = jnp.asarray(ids)
        in_group = jnp.isin(safe, ids_a) & mask
        pos = jnp.argmax(safe[:, None] == ids_a[None, :], axis=1)
        tgt = jnp.where(in_group, pos + 1, 0)               # 0 = others
        logp = jax.nn.log_softmax(lf[:, start:start + n_log], axis=1)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        # others sampling (reference _sample_others): keep all in-group rows
        # + ~beta x fg_num of the others rows; fg_num == 0 -> group skipped
        fg_num = (in_group & mask).astype(jnp.float32).sum()
        others = mask & ~in_group
        bg_num = others.astype(jnp.float32).sum()
        keep_p = jnp.clip(beta * fg_num / jnp.maximum(bg_num, 1.0), 0.0, 1.0)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            kept = jax.random.bernoulli(sub, keep_p, shape=labels.shape)
            w = jnp.where(in_group, 1.0, jnp.where(
                others & kept, 1.0, 0.0))
        else:
            w = jnp.where(in_group, 1.0, jnp.where(others, keep_p, 0.0))
        w = jnp.where(fg_num > 0, w, 0.0)
        total = total + (nll * w * mf).sum() / jnp.maximum((w * mf).sum(),
                                                           1.0)

    # fg/bg group: label 0 for fg classes, 1 for bg (group_label_maps last
    # row); all valid non-ignored rows, weight 1
    start, _ = fgbg_slice
    is_bg = jnp.isin(safe, jnp.asarray(fgbg_ids[1]))
    logp = jax.nn.log_softmax(lf[:, start:start + 2], axis=1)
    nll = -jnp.take_along_axis(
        logp, is_bg.astype(jnp.int32)[:, None], axis=1)[:, 0]
    total = total + (nll * mf).sum() / jnp.maximum(mf.sum(), 1.0)
    return total


def group_softmax_activation(
    ext_logits: jax.Array,   # [N, C + 1 + num_group]
    *,
    num_class: int,
    class_names: Optional[Sequence[str]] = None,
    version: str = "bgfg",
    bgfg_weight: bool = True,
) -> jax.Array:
    """Map extended-head logits back to [N, C] class scores for eval
    (reference group_softmax.py get_activation:221-236): per-group softmax
    probabilities of the class channels, optionally scaled by the fg/bg
    probability of the group's side (the fgbg_2 variant's bgfgweight)."""
    if class_names is None:
        from ..data.waymo import WAYMO_CLASS_NAMES
        class_names = WAYMO_CLASS_NAMES[:num_class]
    group_ids, fgbg_ids = group_structure(class_names, version)
    slices, (fg_start, _) = _group_slices(group_ids)
    lf = ext_logits.astype(jnp.float32)
    n = lf.shape[0]
    act = jnp.zeros((n, num_class), jnp.float32)
    bg_prob = jax.nn.softmax(lf[:, fg_start:fg_start + 2], axis=1)
    for ids, (start, n_log) in zip(group_ids, slices):
        if not ids:
            continue
        probs = jax.nn.softmax(lf[:, start:start + n_log], axis=1)[:, 1:]
        act = act.at[:, jnp.asarray(ids)].set(probs)
    if bgfg_weight:
        for side, ids in enumerate(fgbg_ids):
            if ids:
                ids_a = jnp.asarray(ids)
                act = act.at[:, ids_a].multiply(bg_prob[:, side:side + 1])
    return act


# Waymo class groups (reference group_softmax.py:62-67)
WAYMO_GROUPS = [
    ["CAR", "TRUCK", "BUS", "OTHER_VEHICLE"],
    ["MOTORCYCLIST", "BICYCLIST", "PEDESTRIAN", "BICYCLE", "MOTORCYCLE"],
    ["SIGN", "TRAFFIC_LIGHT", "POLE", "CONSTRUCTION_CONE"],
    ["BUILDING", "VEGETATION", "TREE_TRUNK"],
    ["CURB", "ROAD", "LANE_MARKER", "OTHER_GROUND", "WALKABLE", "SIDEWALK"],
]


def eqlv2_init_state(num_class: int) -> Dict[str, jax.Array]:
    """Zero-initialized cross-step gradient buffers (reference eqlv2.py
    get_weight: `_pos_grad is None` on the first call — all-zero stats are
    the equivalent marker here, see `eqlv2_loss`)."""
    z = jnp.zeros((num_class - 1,), jnp.float32)
    return {"pos_grad": z, "neg_grad": z}


def eqlv2_loss(
    logits: jax.Array,   # [N, C]
    labels: jax.Array,   # [N]
    valid: jax.Array,    # [N]
    *,
    state: Optional[Dict[str, jax.Array]] = None,
    ignore_index: int = 0,
    gamma: float = 12.0,
    mu: float = 0.8,
    alpha: float = 4.0,
    axis_name: Optional[str] = None,
):
    """Equalization loss v2: sigmoid BCE with gradient-guided per-class
    down-weighting of negative samples (reference eqlv2.py:8-132).

    With `state` ({pos_grad, neg_grad} [C-1] each, channel `ignore_index`
    excluded as in the reference's [1:] slicing), reproduces the published
    cross-iteration statistics and returns ``(loss, new_state)``:
    - weights come from the ACCUMULATED ratio (all-ones on the first step,
      reference get_weight:121-132);
    - after the loss, |prob - target| * weight sums over the batch are added
      to the buffers (collect_grad:104-117 — note the reference collects
      over ALL rows including ignored ones; only padding is excluded here),
      all-reduced over `axis_name` (dist.all_reduce).
    Without `state`, falls back to batch-local statistics and returns the
    scalar loss.
    """
    n, c = logits.shape
    assert ignore_index == 0, (
        "eqlv2 channel layout follows the reference: class 0 is the "
        "undefined/ignore channel (eqlv2.py collect_grad [1:] slicing)")
    vf = valid.astype(jnp.float32)
    mask = valid & (labels != ignore_index) & (labels >= 0) & (labels < c)
    mf = mask.astype(jnp.float32)
    # expand_label (eqlv2.py:63-67): one-hot for every row, incl. ignored
    safe_lab = jnp.where(valid & (labels >= 0) & (labels < c), labels, 0)
    target = jax.nn.one_hot(safe_lab, c) * vf[:, None]

    lf = logits.astype(jnp.float32)
    probs = jax.nn.sigmoid(lf)

    def ramp(ratio):
        return 1.0 / (1.0 + jnp.exp(-gamma * (ratio - mu)))

    if state is None:
        # batch-local fallback (round-2 behavior)
        g = jnp.abs(probs - target) * mf[:, None]
        pos_grad = (g * target).sum(axis=0)
        neg_grad = (g * (1.0 - target)).sum(axis=0)
        neg_w = ramp(pos_grad / jnp.maximum(neg_grad, 1e-10))
        pos_w = 1.0 + alpha * (1.0 - neg_w)
    else:
        pos_g, neg_g = state["pos_grad"], state["neg_grad"]
        uninit = (pos_g.sum() + neg_g.sum()) == 0.0
        ratio = pos_g / (neg_g + 1e-10)
        neg_w_t = jnp.concatenate([jnp.ones((1,)), ramp(ratio)])
        neg_w = jnp.where(uninit, jnp.ones((c,)), neg_w_t)
        pos_w = 1.0 + alpha * (1.0 - neg_w)

    w = target * pos_w[None, :] + (1.0 - target) * neg_w[None, :]
    bce = -(target * jax.nn.log_sigmoid(lf)
            + (1.0 - target) * jax.nn.log_sigmoid(-lf))
    loss = (bce * w * mf[:, None]).sum() / (mf.sum() + 1e-10)

    if state is None:
        return loss
    # collect_grad on detached score/target/weight (eqlv2.py:104-117)
    g = jax.lax.stop_gradient(jnp.abs(probs - target) * w) * vf[:, None]
    t = jax.lax.stop_gradient(target)
    d_pos = (g * t).sum(axis=0)[1:]
    d_neg = (g * (1.0 - t)).sum(axis=0)[1:]
    if axis_name is not None:
        d_pos = jax.lax.psum(d_pos, axis_name)
        d_neg = jax.lax.psum(d_neg, axis_name)
    new_state = {"pos_grad": state["pos_grad"] + d_pos,
                 "neg_grad": state["neg_grad"] + d_neg}
    return loss, new_state


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
