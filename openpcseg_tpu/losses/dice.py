"""Dice-family losses over padded buffers.

Reference: pcseg/loss/dice_loss_v0.py (one-hot dice), dice_loss_v1.py
(dice w/ negative sampling -> here: plain masked dice), ell_loss.py
(exp-log dice+CE combo). Re-derived for static shapes: ignored/padded lanes
are excluded from both numerator and denominator via the mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ce import cross_entropy


def dice_loss(
    logits: jax.Array,   # [N, C]
    labels: jax.Array,   # [N]
    valid: jax.Array,    # [N]
    *,
    ignore_index: int = 0,
    eps: float = 1.0,
) -> jax.Array:
    n, c = logits.shape
    mask = valid & (labels != ignore_index) & (labels >= 0) & (labels < c)
    maskf = mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * maskf[:, None]
    onehot = jax.nn.one_hot(jnp.where(mask, labels, 0), c) * maskf[:, None]
    inter = (probs * onehot).sum(axis=0)
    denom = probs.sum(axis=0) + onehot.sum(axis=0)
    present = onehot.sum(axis=0) > 0
    dice = (2.0 * inter + eps) / (denom + eps)
    pf = present.astype(jnp.float32)
    return ((1.0 - dice) * pf).sum() / jnp.maximum(pf.sum(), 1.0)


def exp_log_loss(
    logits: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    *,
    ignore_index: int = 0,
    gamma: float = 0.3,
    w_dice: float = 0.8,
    w_ce: float = 0.2,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Exponential-logarithmic dice + CE (reference ell_loss.py)."""
    d = dice_loss(logits, labels, valid, ignore_index=ignore_index)
    ce = cross_entropy(
        logits, labels, valid,
        ignore_index=ignore_index, label_smoothing=label_smoothing,
    )
    return w_dice * jnp.power(jnp.maximum(d, 1e-8), gamma) + \
        w_ce * jnp.power(jnp.maximum(ce, 1e-8), gamma)
