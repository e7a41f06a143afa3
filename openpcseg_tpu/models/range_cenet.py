"""CENet: range-image segmentor (dense 2D CNN), TPU-native (NHWC).

Re-implementation of the reference CENet
(reference: pcseg/model/segmentor/range/cenet/model/semantic/cenet.py:125-327):
3-conv stem (6->64->128->128), four ResNet BasicBlock layers [3,4,6,3] with
strides [1,2,2,2], bilinear upsample of the three strided scales back to
full resolution, concat (640ch) -> 256 -> 128 -> 1x1 classifier; three aux
heads on the upsampled scales during training. Loss recipe in
losses/range_losses.py (1.25/1/1/1 head weights, WCE|dice + 3*Lovász +
Boundary, cenet.py:248-294).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """align_corners=True bilinear, matching torch F.interpolate
    (cenet.py:240-242)."""
    b, ih, iw, c = x.shape
    if ih == h and iw == w:
        return x
    # align_corners=True: sample positions i * (ih-1)/(h-1)
    ys = jnp.linspace(0.0, ih - 1.0, h)
    xs = jnp.linspace(0.0, iw - 1.0, w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx
    )
    return out


class BasicConv2d(nn.Module):
    """conv-BN-LeakyReLU (reference cenet.py:29-57)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return jax.nn.leaky_relu(x)


class BasicBlock(nn.Module):
    """ResNet basic block with LeakyReLU (reference cenet.py:74-122)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=self.stride,
                      use_bias=False)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        out = jax.nn.leaky_relu(out)
        out = nn.Conv(self.features, (3, 3), use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=self.stride,
                               use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9)(identity)
        return jax.nn.leaky_relu(out + identity)


class CENet(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    MODALITY = "range"

    @nn.compact
    def __call__(self, scan: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        layers = self.model_cfgs.get("LAYERS", [3, 4, 6, 3])
        aux = bool(self.model_cfgs.get("IF_AUX", True))
        h, w = scan.shape[1], scan.shape[2]

        x = BasicConv2d(64)(scan, train)
        x = BasicConv2d(128)(x, train)
        x = BasicConv2d(128)(x, train)

        def stage(x, n, stride):
            x = BasicBlock(128, stride)(x, train)
            for _ in range(n - 1):
                x = BasicBlock(128)(x, train)
            return x

        x_1 = stage(x, layers[0], 1)
        x_2 = stage(x_1, layers[1], 2)
        x_3 = stage(x_2, layers[2], 2)
        x_4 = stage(x_3, layers[3], 2)

        res_2 = _resize_bilinear(x_2, h, w)
        res_3 = _resize_bilinear(x_3, h, w)
        res_4 = _resize_bilinear(x_4, h, w)

        out = jnp.concatenate([x, x_1, res_2, res_3, res_4], axis=-1)
        out = BasicConv2d(256)(out, train)
        out = BasicConv2d(128)(out, train)
        logits = nn.Conv(self.num_class, (1, 1), name="semantic_output")(out)

        aux_logits: List[jax.Array] = []
        if aux:
            # heads must exist at init regardless of mode; unused outputs
            # are dead-code-eliminated by XLA at eval
            aux_logits = [
                nn.Conv(self.num_class, (1, 1), name=f"aux_head{i+1}")(r)
                for i, r in enumerate((res_2, res_3, res_4))
            ]
        return logits, (aux_logits if train else [])
