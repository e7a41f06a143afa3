"""Loss dispatcher mirroring the reference's string-keyed combination
(reference: pcseg/loss/__init__.py:15-137). Default everywhere in the config
zoo is ['CELoss', 'LovLoss'] with weights [1, 1].
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .ce import cross_entropy, focal_loss, weighted_cross_entropy  # noqa: F401
from .dice import dice_loss, dice_loss_v1, exp_log_loss  # noqa: F401
from .longtail import (eqlv2_init_state, eqlv2_loss,  # noqa: F401
                       group_softmax_loss, group_softmax_loss_extended)
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
        num_class: Optional[int] = None,
        extended_group_head: bool = False,
        group_version: str = "bgfg",
        axis_name: Optional[str] = None,
    ):
        assert len(loss_types) == len(loss_weights)
        self.loss_types = list(loss_types)
        self.loss_weights = list(loss_weights)
        self.ignore_index = ignore_index
        self.label_smoothing = label_smoothing
        self.num_class = num_class
        self.extended_group_head = extended_group_head
        self.group_version = group_version
        self.axis_name = axis_name
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

    @property
    def stateful(self) -> bool:
        """True when a loss carries cross-step statistics (EQLv2's
        pos/neg-gradient buffers, reference eqlv2.py:24-31)."""
        return "EQLv2" in self.loss_types

    def init_state(self, num_class: Optional[int] = None):
        """Initial loss_state pytree for TrainState (empty when no loss is
        stateful)."""
        c = num_class or self.num_class
        if "EQLv2" in self.loss_types:
            return {"eqlv2": eqlv2_init_state(c)}
        return {}

    def __call__(
        self,
        logits: jax.Array,   # [N, C]
        labels: jax.Array,   # [N]
        valid: jax.Array,    # [N]
        state: Optional[dict] = None,
        rng: Optional[jax.Array] = None,
    ):
        """Weighted loss sum. When ``state`` is given (the TrainState
        loss_state pytree), returns ``(loss, new_state)``; otherwise the
        scalar loss (stateful losses then use batch-local statistics)."""
        new_state = dict(state) if state is not None else None
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
            elif name == "DiceLossV0":
                v = dice_loss(
                    logits, labels, valid, ignore_index=self.ignore_index
                )
            elif name == "DiceLossV1":
                if rng is not None:
                    v = dice_loss_v1(
                        logits, labels, valid, rng,
                        ignore_index=self.ignore_index,
                    )
                else:
                    # eval / no-rng path: deterministic fallback without
                    # negative sampling
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
                if state is not None and "eqlv2" in state:
                    v, new_state["eqlv2"] = eqlv2_loss(
                        logits, labels, valid, state=state["eqlv2"],
                        ignore_index=self.ignore_index,
                        axis_name=self.axis_name,
                    )
                else:
                    v = eqlv2_loss(
                        logits, labels, valid,
                        ignore_index=self.ignore_index,
                    )
            elif name in ("GroupSoftmax", "GroupSoftmax_fgbg_2"):
                if self.extended_group_head:
                    v = group_softmax_loss_extended(
                        logits, labels, valid,
                        num_class=self.num_class or logits.shape[-1],
                        class_names=self.class_names,
                        version=self.group_version,
                        ignore_index=self.ignore_index,
                        rng=rng,
                    )
                else:
                    v = group_softmax_loss(
                        logits, labels, valid,
                        class_names=self.class_names,
                        ignore_index=self.ignore_index,
                    )
            else:  # pragma: no cover - guarded in __init__
                raise NotImplementedError(name)
            total = total + w * v
        if state is not None:
            return total, new_state
        return total
