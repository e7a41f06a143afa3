"""Range-view (dense image) losses.

Re-implementations of the reference's range loss set
(reference: pcseg/model/segmentor/range/utils.py):
- ClassWeightSemikitti inverse-frequency weights (:344-374)
- weighted CE over pixels (torch CrossEntropyLoss(weight, reduction='none')
  .mean(): class-0 weight is 0.0 and the mean divides by ALL pixels)
- CrossEntropyDiceLoss (:CE + dice combo used with LOSS: 'dice')
- image Lovász-softmax with ignore=0 (:440-516) — reuses the static-shape
  flat Lovász from losses/lovasz.py
- BoundaryLoss (:665-726, after Bokhovkin et al. arXiv:1905.07852):
  boundary maps via 3x3 max-pool of (1 - x), precision/recall F1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .lovasz import lovasz_softmax

# (reference range/utils.py:344-367)
CLASS_FREQ_WEIGHTS = [
    0.0,
    1.0 / (0.040818519255974316 + 0.001789309418528068 + 0.001),
    1.0 / (0.00016609538710764618 + 0.001),
    1.0 / (0.00039838616015114444 + 0.001),
    1.0 / (0.0020633612104619787 + 0.00010157861367183268 + 0.001),
    1.0 / (2.7879693665067774e-05 + 0.0016218197275284021
           + 0.00011351574470342043 + 4.3840131989471124e-05 + 0.001),
    1.0 / (0.00017698551338515307 + 0.00016059776092534436 + 0.001),
    1.0 / (1.1065903904919655e-08 + 0.00012709999297008662 + 0.001),
    1.0 / (5.532951952459828e-09 + 3.745553104802113e-05 + 0.001),
    1.0 / (0.1987493871255525 + 4.7084144280367186e-05 + 0.001),
    1.0 / (0.014717169549888214 + 0.001),
    1.0 / (0.14392298360372 + 0.001),
    1.0 / (0.0039048553037472045 + 0.001),
    1.0 / (0.1326861944777486 + 0.001),
    1.0 / (0.0723592229456223 + 0.001),
    1.0 / (0.26681502148037506 + 0.001),
    1.0 / (0.006035012012626033 + 0.001),
    1.0 / (0.07814222006271769 + 0.001),
    1.0 / (0.002855498193863172 + 0.001),
    1.0 / (0.0006155958086189918 + 0.001),
]


def wce_image(logits: jax.Array, labels: jax.Array,
              top_k_percent: float = 1.0) -> jax.Array:
    """Weighted CE over all pixels; logits [B,H,W,C], labels [B,H,W].

    torch semantics: weighted NLL per pixel (class-0 weight 0), reduction
    'none' then .mean() over all pixels (NOT weight-normalized). top_k < 1
    keeps the hardest pixels (reference cenet.py:255-261).
    """
    c = logits.shape[-1]
    w = jnp.asarray(CLASS_FREQ_WEIGHTS[:c], jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.clip(labels, 0, c - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    pix = nll * w[safe]
    flat = pix.reshape(-1)
    if top_k_percent < 1.0:
        k = max(1, int(top_k_percent * flat.shape[0]))
        flat = jax.lax.top_k(flat, k)[0]
    return flat.mean()


def ce_dice_image(logits: jax.Array, labels: jax.Array,
                  top_k_percent: float = 1.0,
                  ignore_index: int = 0) -> jax.Array:
    """CE + dice over the image (reference CrossEntropyDiceLoss)."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.clip(labels, 0, c - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    valid = (labels != ignore_index).astype(jnp.float32)
    flat = (nll * valid).reshape(-1)
    if top_k_percent < 1.0:
        k = max(1, int(top_k_percent * flat.shape[0]))
        flat = jax.lax.top_k(flat, k)[0]
        ce = flat.mean()
    else:
        ce = flat.sum() / jnp.maximum(valid.sum(), 1.0)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(safe, c) * valid[..., None]
    probs = probs * valid[..., None]
    inter = (probs * onehot).sum(axis=(0, 1, 2))
    denom = probs.sum(axis=(0, 1, 2)) + onehot.sum(axis=(0, 1, 2))
    present = onehot.sum(axis=(0, 1, 2)) > 0
    dice = (2 * inter + 1.0) / (denom + 1.0)
    pf = present.astype(jnp.float32)
    dice_loss = ((1.0 - dice) * pf).sum() / jnp.maximum(pf.sum(), 1.0)
    return ce + dice_loss


def lovasz_image(logits: jax.Array, labels: jax.Array,
                 ignore_index: int = 0) -> jax.Array:
    """Image Lovász-softmax with ignore (reference Lovasz_softmax(ignore=0))."""
    c = logits.shape[-1]
    probas = jax.nn.softmax(
        logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    flat_labels = labels.reshape(-1)
    valid = jnp.ones_like(flat_labels, dtype=bool)
    return lovasz_softmax(probas, flat_labels, valid,
                          ignore_index=ignore_index)


def _maxpool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 same-pad max pool over [B,H,W,C]."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def boundary_loss(probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Boundary F1 loss (reference range/utils.py:665-726).

    probs: softmax probabilities [B,H,W,C]; labels [B,H,W].
    """
    c = probs.shape[-1]
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, c - 1), c)
    gt_b = _maxpool3(1.0 - onehot) - (1.0 - onehot)
    pred_b = _maxpool3(1.0 - probs) - (1.0 - probs)

    gt_b = gt_b.reshape(gt_b.shape[0], -1, c)
    pred_b = pred_b.reshape(pred_b.shape[0], -1, c)
    inter = jnp.sum(pred_b * gt_b, axis=1)
    p = inter / (jnp.sum(pred_b, axis=1) + 1e-7)
    r = inter / (jnp.sum(gt_b, axis=1) + 1e-7)
    bf1 = 2 * p * r / (p + r + 1e-7)
    return jnp.mean(1.0 - bf1)


def range_seg_loss(
    logits: jax.Array,             # [B,H,W,C]
    aux_logits,                    # list of [B,H,W,C] (may be empty)
    labels: jax.Array,             # [B,H,W]
    *,
    loss_kind: str = "wce",        # MODEL.LOSS in {'wce', 'dice'}
    top_k_percent: float = 1.0,    # MODEL.TOP_K_PERCENT_PIXELS
    if_ls: bool = True,            # MODEL.IF_LS_LOSS
    if_bd: bool = True,            # MODEL.IF_BD_LOSS
    ignore_index: int = 0,
) -> jax.Array:
    """The shared range loss recipe: 1.0*CE + 3.0*Lovász + 1.0*Boundary,
    main head weighted 1.25 when aux heads exist
    (reference cenet.py:248-294, salsanext.py:251-272)."""
    def ce(lg, topk):
        if loss_kind == "dice":
            return ce_dice_image(lg, labels, topk, ignore_index)
        return wce_image(lg, labels, topk)

    heads = [logits] + list(aux_logits)
    wts = [1.25] + [1.0] * len(aux_logits) if aux_logits else [1.0]

    loss_ce = sum(w * ce(lg, top_k_percent if i == 0 else 1.0)
                  for i, (w, lg) in enumerate(zip(wts, heads)))
    loss_ls = 0.0
    if if_ls:
        loss_ls = sum(w * lovasz_image(lg, labels, ignore_index)
                      for w, lg in zip(wts, heads))
    loss_bd = 0.0
    if if_bd:
        loss_bd = sum(
            w * boundary_loss(
                jax.nn.softmax(lg.astype(jnp.float32), axis=-1), labels)
            for w, lg in zip(wts, heads))
    return 1.0 * loss_ce + 3.0 * loss_ls + 1.0 * loss_bd
