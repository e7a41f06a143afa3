"""Range <-> point feature transfer for RPVNet-style fusion.

TPU-native replacements for:
- ``range_to_point``: per-point bilinear sampling of a range feature map
  (reference: pcseg/model/segmentor/fusion/rpvnet/rpvnet.py:32-51 via
  torch F.grid_sample, align_corners=False semantics)
- ``point_to_range``: mean-scatter of point features into an image
  (reference: rpvnet.py:73-91 via the custom CUDA range_lib kernels
  map_count + denselize, package/range_lib.zip
  range_utils/src/{map_count_gpu.cu,denselize_gpu.cu})

Both are pure XLA gather / segment ops over the flattened [B*H*W] pixel
space — no custom kernels needed, and autodiff supplies the backward that
range_lib hand-writes (denselize_gpu.cu backward).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .segment import segment_mean


def range_to_point(
    fmap: jax.Array,       # [B, H, W, C]
    pxpy: jax.Array,       # [N, 2] normalized coords in [-1, 1] (px, py)
    batch_idx: jax.Array,  # [N] int32
    valid: jax.Array,      # [N] bool
) -> jax.Array:
    """Bilinear sample per point; zeros for invalid points.

    Follows torch grid_sample(align_corners=False): x_pix = ((px+1)*W-1)/2,
    out-of-range corners clamp to the border (padding_mode='zeros' would
    zero them; the reference relies on in-range pxpy so clamping matches).
    """
    b, h, w, c = fmap.shape
    x = ((pxpy[:, 0] + 1.0) * w - 1.0) / 2.0
    y = ((pxpy[:, 1] + 1.0) * h - 1.0) / 2.0
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    flat = fmap.reshape(b * h * w, c)
    bi = jnp.maximum(batch_idx, 0)

    def corner(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return flat[(bi * h + yc) * w + xc]

    out = (
        corner(y0, x0) * ((1 - fx) * (1 - fy))[:, None]
        + corner(y0, x0 + 1) * (fx * (1 - fy))[:, None]
        + corner(y0 + 1, x0) * ((1 - fx) * fy)[:, None]
        + corner(y0 + 1, x0 + 1) * (fx * fy)[:, None]
    )
    return jnp.where(valid[:, None], out, 0.0)


def point_to_range(
    pf: jax.Array,         # [N, C] point features
    pxpy: jax.Array,       # [N, 2] normalized coords in [-1, 1]
    batch_idx: jax.Array,  # [N] int32
    valid: jax.Array,      # [N] bool
    b: int, h: int, w: int,
) -> jax.Array:
    """Mean-scatter point features to a [B, H, W, C] map (empty pixels 0).

    Pixel indexing matches the reference's int_pxpy = (p+1)/2 * (size-1)
    truncation (rpvnet.py:86-88).
    """
    x = ((pxpy[:, 0] + 1.0) / 2.0 * (w - 1)).astype(jnp.int32)
    y = ((pxpy[:, 1] + 1.0) / 2.0 * (h - 1)).astype(jnp.int32)
    x = jnp.clip(x, 0, w - 1)
    y = jnp.clip(y, 0, h - 1)
    lin = (jnp.maximum(batch_idx, 0) * h + y) * w + x
    lin = jnp.where(valid, lin, -1)
    mean, _ = segment_mean(pf, lin, b * h * w)
    return mean.reshape(b, h, w, pf.shape[-1])
