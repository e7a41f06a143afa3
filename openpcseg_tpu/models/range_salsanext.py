"""SalsaNext: range-image segmentor (dilated ResContext + pooled ResBlocks +
PixelShuffle UpBlocks), TPU-native (NHWC).

Re-implementation of the reference SalsaNext
(reference: pcseg/model/segmentor/range/salsanext/model/semantic/
salsanext.py:9-280). The same encoder/decoder is reused as RPVNet's range
branch (reference rpvnet.py:205-253 embeds SalsaNext).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9)


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC pixel shuffle: [B,H,W,C*r^2] -> [B,H*r,W*r,C].

    Channel order matches torch nn.PixelShuffle (C-major over (C, r, r)).
    """
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, co
    return x.reshape(b, h * r, w * r, co)


class ResContextBlock(nn.Module):
    """(reference salsanext.py:9-37)"""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = jax.nn.leaky_relu(nn.Conv(self.features, (1, 1))(x))
        res = jax.nn.leaky_relu(nn.Conv(self.features, (3, 3))(shortcut))
        res1 = _bn(train)(res)
        res = jax.nn.leaky_relu(
            nn.Conv(self.features, (3, 3), kernel_dilation=2)(res1))
        res2 = _bn(train)(res)
        return shortcut + res2


class SalsaResBlock(nn.Module):
    """(reference salsanext.py:40-115); returns (pooled, skip) if pooling."""

    features: int
    dropout_rate: float = 0.2
    pooling: bool = True
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = jax.nn.leaky_relu(nn.Conv(self.features, (1, 1))(x))
        res = jax.nn.leaky_relu(nn.Conv(self.features, (3, 3))(x))
        res1 = _bn(train)(res)
        res = jax.nn.leaky_relu(
            nn.Conv(self.features, (3, 3), kernel_dilation=2)(res1))
        res2 = _bn(train)(res)
        res = jax.nn.leaky_relu(
            nn.Conv(self.features, (2, 2), kernel_dilation=2,
                    padding=((1, 1), (1, 1)))(res2))
        res3 = _bn(train)(res)
        concat = jnp.concatenate([res1, res2, res3], axis=-1)
        res = jax.nn.leaky_relu(nn.Conv(self.features, (1, 1))(concat))
        res = _bn(train)(res)
        res = shortcut + res

        drop = nn.Dropout(self.dropout_rate, deterministic=not train)
        if self.pooling:
            pooled = drop(res) if self.drop_out else res
            # AvgPool2d(3, stride=2, padding=1), count_include_pad=True
            pooled = jax.lax.reduce_window(
                pooled, 0.0, jax.lax.add,
                (1, 3, 3, 1), (1, 2, 2, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            ) / 9.0
            return pooled, res
        return (drop(res) if self.drop_out else res), res


class SalsaUpBlock(nn.Module):
    """(reference salsanext.py:118-175)"""

    features: int
    dropout_rate: float = 0.2
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, skip, train: bool):
        drop = lambda y: nn.Dropout(
            self.dropout_rate, deterministic=not train)(y)
        up = pixel_shuffle(x, 2)
        if self.drop_out:
            up = drop(up)
        up = jnp.concatenate([up, skip], axis=-1)
        if self.drop_out:
            up = drop(up)
        e = jax.nn.leaky_relu(nn.Conv(self.features, (3, 3))(up))
        e1 = _bn(train)(e)
        e = jax.nn.leaky_relu(
            nn.Conv(self.features, (3, 3), kernel_dilation=2)(e1))
        e2 = _bn(train)(e)
        e = jax.nn.leaky_relu(
            nn.Conv(self.features, (2, 2), kernel_dilation=2,
                    padding=((1, 1), (1, 1)))(e2))
        e3 = _bn(train)(e)
        concat = jnp.concatenate([e1, e2, e3], axis=-1)
        e = jax.nn.leaky_relu(nn.Conv(self.features, (1, 1))(concat))
        e = _bn(train)(e)
        if self.drop_out:
            e = drop(e)
        return e


class SalsaNextBackbone(nn.Module):
    """Encoder-decoder trunk, reusable by RPVNet's range branch."""

    base: int = 32
    in_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        b = self.base
        if self.in_stem:
            x = ResContextBlock(b)(x, train)
            x = ResContextBlock(b)(x, train)
            x = ResContextBlock(b)(x, train)

        d0c, d0b = SalsaResBlock(2 * b, pooling=True, drop_out=False)(x, train)
        d1c, d1b = SalsaResBlock(4 * b, pooling=True)(d0c, train)
        d2c, d2b = SalsaResBlock(8 * b, pooling=True)(d1c, train)
        d3c, d3b = SalsaResBlock(8 * b, pooling=True)(d2c, train)
        d5c, _ = SalsaResBlock(8 * b, pooling=False)(d3c, train)

        u4 = SalsaUpBlock(4 * b)(d5c, d3b, train)
        u3 = SalsaUpBlock(4 * b)(u4, d2b, train)
        u2 = SalsaUpBlock(2 * b)(u3, d1b, train)
        u1 = SalsaUpBlock(b, drop_out=False)(u2, d0b, train)
        return u1


class SalsaNext(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    MODALITY = "range"

    @nn.compact
    def __call__(self, scan: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        feat = SalsaNextBackbone(base=32)(scan, train)
        logits = nn.Conv(self.num_class, (1, 1), name="logits")(feat)
        return logits, []
