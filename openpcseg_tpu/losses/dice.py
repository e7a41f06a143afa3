"""Dice-family losses over padded buffers.

Reference: pcseg/loss/dice_loss_v0.py (one-hot dice), dice_loss_v1.py
(per-point binary dice with 3:1 negative sampling), ell_loss.py
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


def dice_loss_v1(
    logits: jax.Array,   # [N, C]
    labels: jax.Array,   # [N]
    valid: jax.Array,    # [N]
    rng: jax.Array,      # PRNG key (per-step)
    *,
    ignore_index: int = 0,
    smooth: float = 1.0,
    exponent: float = 2.0,
) -> jax.Array:
    """Per-point binary dice with 3:1 negative sampling.

    Reference dice_loss_v1.py treats EVERY point as its own [1]-sized dice
    "sample": per class i, per-point loss = 1 - (2*p*t + s)/(p^e + t^e + s)
    with p = softmax prob of class i and t the one-hot target, then averages
    over {all positives} ∪ {a uniformly random subset of negatives of size
    min(3*npos, nneg)} (dice_loss_v1.py:54-71). Static-shape port: the exact
    random subset is realized by ranking per-point uniform draws and keeping
    ranks < tot, where tot is a traced scalar — same distribution as
    torch.randperm(nneg)[:tot]. Classes are summed and divided by C
    (including the ignored class, matching :96-104's total/target.shape[1]).
    """
    n, c = logits.shape
    ok = valid & (labels != ignore_index) & (labels >= 0) & (labels < c)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def per_class(i, key):
        p = probs[:, i]
        pos = ok & (labels == i)
        neg = ok & (labels != i)
        npos = pos.sum()
        tot = jnp.minimum(3 * npos, neg.sum())
        # rank uniform draws among negatives; keep the tot smallest
        r = jax.random.uniform(key, (n,))
        r = jnp.where(neg, r, jnp.inf)
        order = jnp.argsort(r)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        sel = pos | (neg & (rank < tot))
        t = pos.astype(jnp.float32)
        num = 2.0 * p * t + smooth
        den = p**exponent + t**exponent + smooth
        loss = 1.0 - num / den
        sf = sel.astype(jnp.float32)
        return (loss * sf).sum() / (sf.sum() + 1e-10)

    keys = jax.random.split(rng, c)
    losses = jax.vmap(per_class)(jnp.arange(c), keys)
    live = jnp.arange(c) != ignore_index
    return (losses * live.astype(jnp.float32)).sum() / c


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
