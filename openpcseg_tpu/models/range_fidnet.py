"""FIDNet: range-image segmentor with pointwise-conv stem + ResNet34
backbone + interpolation-concat semantic head, TPU-native (NHWC).

Re-implementation of the reference FIDNet
(reference: pcseg/model/segmentor/range/fidnet/model/semantic/fidnet.py:
9-332): 1x1 stem 6->64->128->256->512 (bias, BN, LeakyReLU), four
BasicBlock layers [3,4,6,3] at 128 planes with strides [1,2,2,2],
align-corners bilinear upsample of the strided scales, 1024-ch concat,
SemanticHead 1024->512->128->num_class. Loss recipe shared with the other
range models (no aux heads).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .range_cenet import BasicBlock, _resize_bilinear


class FIDNet(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    MODALITY = "range"

    @nn.compact
    def __call__(self, scan: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        layers = self.model_cfgs.get("LAYERS", [3, 4, 6, 3])
        h, w = scan.shape[1], scan.shape[2]

        x = scan
        for width in (64, 128, 256, 512):  # pointwise stem (fidnet.py:215-241)
            x = nn.Conv(width, (1, 1), use_bias=True)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = jax.nn.leaky_relu(x)

        def stage(y, n, stride):
            y = BasicBlock(128, stride)(y, train)
            for _ in range(n - 1):
                y = BasicBlock(128)(y, train)
            return y

        x_1 = stage(x, layers[0], 1)
        x_2 = stage(x_1, layers[1], 2)
        x_3 = stage(x_2, layers[2], 2)
        x_4 = stage(x_3, layers[3], 2)

        res = jnp.concatenate([
            x, x_1,
            _resize_bilinear(x_2, h, w),
            _resize_bilinear(x_3, h, w),
            _resize_bilinear(x_4, h, w),
        ], axis=-1)  # 1024 ch

        # SemanticHead (fidnet.py:170-196)
        y = nn.Conv(512, (1, 1))(res)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = jax.nn.leaky_relu(y)
        y = nn.Conv(128, (1, 1))(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = jax.nn.leaky_relu(y)
        logits = nn.Conv(self.num_class, (1, 1), name="semantic_output")(y)
        return logits, []
