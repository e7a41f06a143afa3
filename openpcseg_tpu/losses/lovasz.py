"""Lovász-Softmax loss, static-shape TPU formulation.

Re-derivation of the classic Lovász-softmax (Berman 2018) as used by the
reference (reference: tools/utils/common/lovasz_losses.py:23-33 lovasz_grad,
:158-204 lovasz_softmax/_flat, classes='present', per_image=False).

The reference filters ignored pixels out (dynamic shapes) then sorts per
class. Here padding/ignored lanes stay in the buffer with error forced to 0
and fg 0: they sort to the tail of the descending error order where the
error factor zeroes their contribution, so the result equals the reference's
filtered computation exactly (zero-error valid rows contribute zero either
way). Classes absent from the batch are masked out of the mean
('present' mode).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad(fg_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t. sorted errors
    (reference lovasz_losses.py:23-33)."""
    gts = fg_sorted.sum()
    intersection = gts - jnp.cumsum(fg_sorted)
    union = gts + jnp.cumsum(1.0 - fg_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@jax.custom_vjp
def _lovasz_class(errors: jax.Array, fg: jax.Array) -> jax.Array:
    """Single-class Lovász term: sort errors descending, dot with grad.

    Custom VJP: d loss / d errors[i] = lovasz_grad[rank(i)] (the loss is
    linear in the sorted errors; the permutation and fg carry no gradient).
    The unpermute is expressed as an int-key sort of (perm, grad) — a
    batched TPU sort of [C, N] costs ~3 ms/step where the equivalent
    gather-by-rank profiled at 20 ms (1-D scalar gathers) and autodiff's
    scatter-through-the-sort at 14.6 ms.
    """
    neg_err, fg_sorted = jax.lax.sort((-errors, fg), num_keys=1)
    return jnp.dot(-neg_err, _lovasz_grad(fg_sorted))


def _lovasz_class_fwd(errors, fg):
    n = errors.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    neg_err, fg_sorted, perm = jax.lax.sort((-errors, fg, iota), num_keys=1)
    grad = _lovasz_grad(fg_sorted)
    loss = jnp.dot(-neg_err, grad)
    return loss, (grad, perm)


def _lovasz_class_bwd(res, g):
    grad, perm = res
    # unpermute grad to original row order: sorting (perm, grad) by the
    # permutation carries grad[j] to slot perm[j]
    _, derr = jax.lax.sort((perm, grad), num_keys=1)
    return (g * derr, jnp.zeros_like(grad))


_lovasz_class.defvjp(_lovasz_class_fwd, _lovasz_class_bwd)


def lovasz_softmax(
    probas: jax.Array,   # [N, C] softmax probabilities
    labels: jax.Array,   # [N] int32
    valid: jax.Array,    # [N] bool lane mask
    *,
    ignore_index: int = 0,
) -> jax.Array:
    """Multi-class Lovász-softmax, mean over classes present in the batch."""
    n, c = probas.shape
    mask = valid & (labels != ignore_index) & (labels >= 0) & (labels < c)
    maskf = mask.astype(jnp.float32)

    classes = jnp.arange(c, dtype=labels.dtype)
    fg = (labels[None, :] == classes[:, None]).astype(jnp.float32) * maskf  # [C, N]
    errors = jnp.abs(fg - probas.astype(jnp.float32).T) * maskf             # [C, N]

    losses = jax.vmap(_lovasz_class)(errors, fg)  # [C]
    present = fg.sum(axis=1) > 0
    pf = present.astype(jnp.float32)
    return (losses * pf).sum() / jnp.maximum(pf.sum(), 1.0)
