"""Segmentor registry (reference: pcseg/model/segmentor/__init__.py:24-53).

``build_segmentor(model_cfgs, num_class)`` maps MODEL.NAME to a flax module
class. The reference's ``load_data_to_gpu`` host->device mover
(pcseg/model/__init__.py:17-31) has no equivalent here: batches are device
arrays produced by the input pipeline and moved by jit donation.
"""
from __future__ import annotations

from typing import Any

from .cylinder3d import Cylinder_TS
from .minkunet import MinkUNet
from .range_cenet import CENet
from .range_fidnet import FIDNet
from .range_rangenet import RangeNet
from .range_salsanext import SalsaNext
from .rpvnet import RPVNet
from .spvcnn import SPVCNN

__all__ = ["CENet", "Cylinder_TS", "FIDNet", "MinkUNet", "RPVNet",
           "RangeNet", "SPVCNN", "SalsaNext", "build_segmentor",
           "SEGMENTORS"]

SEGMENTORS: dict[str, Any] = {
    "MinkUNet": MinkUNet,
    "SPVCNN": SPVCNN,
    "Cylinder_TS": Cylinder_TS,
    "CENet": CENet,
    "SalsaNext": SalsaNext,
    "FIDNet": FIDNet,
    "RangeNet": RangeNet,
    "RPVNet": RPVNet,
}


def build_segmentor(model_cfgs, num_class: int, **kwargs):
    name = model_cfgs.NAME
    if name not in SEGMENTORS:
        raise NotImplementedError(
            f"segmentor {name!r} not in registry {sorted(SEGMENTORS)}"
        )
    return SEGMENTORS[name](model_cfgs=model_cfgs, num_class=num_class, **kwargs)
