"""Loss dispatcher mirroring the reference's string-keyed combination
(reference: pcseg/loss/__init__.py:15-137). Default everywhere in the config
zoo is ['CELoss', 'LovLoss'] with weights [1, 1].
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .ce import cross_entropy, focal_loss, weighted_cross_entropy  # noqa: F401
from .dice import dice_loss, exp_log_loss  # noqa: F401
from .longtail import eqlv2_loss, group_softmax_loss  # noqa: F401
from .lovasz import lovasz_softmax  # noqa: F401


class Losses:
    """Weighted sum of named losses over padded (logits, labels, valid).

    Signature kept close to the reference Losses module
    (pcseg/loss/__init__.py:16-26); `knn` is accepted for interface parity
    (used only by the dead GeoLoss path in the reference).
    """

    def __init__(
        self,
        loss_types: Sequence[str],
        loss_weights: Sequence[float],
        cls_num_pts: Optional[Sequence[float]] = None,
        ignore_index: int = 0,
        knn: int = 10,
        label_smoothing: float = 0.0,
        class_weight=None,
        class_names: Optional[List[str]] = None,
    ):
        assert len(loss_types) == len(loss_weights)
        self.loss_types = list(loss_types)
        self.loss_weights = list(loss_weights)
        self.ignore_index = ignore_index
        self.label_smoothing = label_smoothing
        self.class_weight = (
            jnp.asarray(class_weight) if class_weight is not None else None
        )
        self.cls_num_pts = (
            jnp.asarray(cls_num_pts, jnp.float32) if cls_num_pts is not None else None
        )
        self.class_names = class_names
        del knn
        known = {"CELoss", "LovLoss", "WCELoss", "FocalLoss",
                 "DiceLossV0", "DiceLossV1", "ELLLoss", "EQLv2",
                 "GroupSoftmax", "GroupSoftmax_fgbg_2"}
        unknown = set(self.loss_types) - known
        if unknown:
            raise NotImplementedError(f"loss types not implemented: {unknown}")

    def __call__(
        self,
        logits: jax.Array,   # [N, C]
        labels: jax.Array,   # [N]
        valid: jax.Array,    # [N]
    ) -> jax.Array:
        total = jnp.float32(0.0)
        for name, w in zip(self.loss_types, self.loss_weights):
            if name == "CELoss":
                v = cross_entropy(
                    logits, labels, valid,
                    ignore_index=self.ignore_index,
                    label_smoothing=self.label_smoothing,
                    class_weight=self.class_weight,
                )
            elif name == "LovLoss":
                probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                v = lovasz_softmax(
                    probas, labels, valid, ignore_index=self.ignore_index
                )
            elif name == "WCELoss":
                assert self.cls_num_pts is not None, "WCELoss needs cls_num_pts"
                v = weighted_cross_entropy(
                    logits, labels, valid,
                    cls_num_pts=self.cls_num_pts,
                    ignore_index=self.ignore_index,
                    label_smoothing=self.label_smoothing,
                )
            elif name == "FocalLoss":
                v = focal_loss(
                    logits, labels, valid, ignore_index=self.ignore_index
                )
            elif name in ("DiceLossV0", "DiceLossV1"):
                v = dice_loss(
                    logits, labels, valid, ignore_index=self.ignore_index
                )
            elif name == "ELLLoss":
                v = exp_log_loss(
                    logits, labels, valid,
                    ignore_index=self.ignore_index,
                    label_smoothing=self.label_smoothing,
                )
            elif name == "EQLv2":
                v = eqlv2_loss(
                    logits, labels, valid, ignore_index=self.ignore_index
                )
            elif name in ("GroupSoftmax", "GroupSoftmax_fgbg_2"):
                v = group_softmax_loss(
                    logits, labels, valid,
                    class_names=self.class_names,
                    ignore_index=self.ignore_index,
                )
            else:  # pragma: no cover - guarded in __init__
                raise NotImplementedError(name)
            total = total + w * v
        return total
