"""Confusion-matrix metrics (mIoU), device-side and host-side.

Replaces the reference's numpy fast_hist/per_class_iu
(reference: train.py:35-52) and its filesystem-pickle distributed merge
(reference: tools/utils/common/common_utils.py:200-221 merge_results_dist)
with an on-device histogram that can be psum'd across the data axis —
no host sync per scan (the reference loops scans in Python,
minkunet.py:436-455).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jax.Array,     # [N] int32 predicted class
    label: jax.Array,    # [N] int32 ground-truth class
    valid: jax.Array,    # [N] bool
    num_class: int,
) -> jax.Array:
    """hist[i, j] = #(label==i, pred==j) over valid lanes
    (reference fast_hist, train.py:35-45 — the k-mask there additionally
    bounds labels, replicated here)."""
    ok = valid & (label >= 0) & (label < num_class) & (pred >= 0) & (pred < num_class)
    flat = jnp.where(ok, label * num_class + pred, num_class * num_class)
    hist = jnp.zeros((num_class * num_class + 1,), jnp.int32).at[flat].add(1)
    return hist[:-1].reshape(num_class, num_class)


def per_class_iou(hist: np.ndarray) -> np.ndarray:
    """IoU per class from a confusion matrix (reference train.py:41-45)."""
    hist = np.asarray(hist, np.float64)
    denom = hist.sum(1) + hist.sum(0) - np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / denom


def crop_hist(hist: np.ndarray, unique_label: Sequence[int]) -> np.ndarray:
    """Crop the full confusion matrix to the evaluated classes
    (reference fast_hist_crop, train.py:47-52: rows/cols unique_label+1)."""
    ul = np.asarray(unique_label) + 1
    return np.asarray(hist)[np.ix_(ul, ul)]


def miou_from_hist(
    hist: np.ndarray, unique_label: Optional[Sequence[int]] = None
) -> tuple[float, np.ndarray]:
    """Mean IoU (%) + per-class IoU over the evaluated class set."""
    h = crop_hist(hist, unique_label) if unique_label is not None else np.asarray(hist)
    iou = per_class_iou(h)
    return float(np.nanmean(iou) * 100.0), iou * 100.0
