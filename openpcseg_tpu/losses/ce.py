"""Cross-entropy family over padded buffers.

Matches torch.nn.CrossEntropyLoss semantics used by the reference
(reference: pcseg/loss/__init__.py:52-56): ignore_index masks samples,
label_smoothing distributes eps/C uniformly over all class channels, the
reduction is the mean over non-ignored samples. Additionally takes a lane
validity mask (our padding), which the reference doesn't need because its
shapes are dynamic.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array,            # [N, C] float
    labels: jax.Array,            # [N] int32
    valid: jax.Array,             # [N] bool lane mask
    *,
    ignore_index: int = 0,
    label_smoothing: float = 0.0,
    class_weight: Optional[jax.Array] = None,  # [C]
) -> jax.Array:
    n_cls = logits.shape[-1]
    mask = valid & (labels != ignore_index) & (labels >= 0) & (labels < n_cls)
    safe_labels = jnp.where(mask, labels, 0)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        loss = nll

    if class_weight is not None:
        w = class_weight[safe_labels]
    else:
        w = jnp.ones_like(loss)
    w = w * mask.astype(loss.dtype)
    denom = jnp.maximum(w.sum(), 1e-12)
    return (loss * w).sum() / denom


def weighted_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    *,
    cls_num_pts: jax.Array,  # [C] per-class point counts
    ignore_index: int = 0,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Inverse-sqrt-frequency weighted CE (reference: pcseg/loss/wce_loss.py:5-29)."""
    freq = cls_num_pts / jnp.maximum(cls_num_pts.sum(), 1.0)
    weight = 1.0 / jnp.sqrt(jnp.maximum(freq, 1e-12))
    weight = weight / weight.sum() * cls_num_pts.shape[0]
    return cross_entropy(
        logits, labels, valid,
        ignore_index=ignore_index,
        label_smoothing=label_smoothing,
        class_weight=weight,
    )


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    *,
    gamma: float = 0.5,
    ignore_index: int = 0,
) -> jax.Array:
    """Multi-class focal loss (reference: pcseg/loss/focalloss.py:6-44,
    gamma=0.5 as constructed in the Losses dispatcher)."""
    n_cls = logits.shape[-1]
    mask = valid & (labels != ignore_index) & (labels >= 0) & (labels < n_cls)
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logpt = jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    loss = -((1.0 - pt) ** gamma) * logpt
    m = mask.astype(loss.dtype)
    return (loss * m).sum() / jnp.maximum(m.sum(), 1.0)
