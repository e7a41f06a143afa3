"""RangeNet++ post-processing: locally-connected CRF + border mask.

TPU-native re-derivations of the reference modules (both OFF in every
shipped reference config — coverage parity):
- CRF       <- pcseg/model/segmentor/range/rangenet/postproc/CRF.py:12-130
  (LocallyConnectedXYZLayer + compat 1x1 + renormalize, iterated)
- borderMask<- .../postproc/borderMask.py:92-200 (one-hot erosion)

The reference uses F.unfold over small odd windows; here each window offset
is a jnp.roll — identical math, static shapes, fuses into a handful of
elementwise passes under jit.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _window_offsets(h: int, w: int):
    assert h % 2 == 1 and w % 2 == 1, "window must be odd"
    return [(dy, dx) for dy in range(-(h // 2), h // 2 + 1)
            for dx in range(-(w // 2), w // 2 + 1)]


@partial(jax.jit, static_argnames=("iters", "lcn_h", "lcn_w"))
def crf_refine(
    xyz: jax.Array,        # [B, H, W, 3] per-pixel xyz (0 where invalid)
    softmax: jax.Array,    # [B, H, W, C]
    mask: jax.Array,       # [B, H, W] bool valid pixels
    *,
    iters: int = 3,
    lcn_h: int = 3,
    lcn_w: int = 5,
    xyz_coef: float = 0.1,
    xyz_sigma: float = 0.7,
) -> jax.Array:
    """Iterative mean-field-style refinement (reference CRF.forward):
    message passing = gaussian-in-xyz weighted window sum of the softmax;
    compatibility = (1 - I) * xyz_coef 1x1 mix; then add + renormalize.
    Returns refined softmax [B, H, W, C]."""
    c = softmax.shape[-1]
    den = 2.0 * xyz_sigma * xyz_sigma
    mf = mask[..., None].astype(softmax.dtype)
    # compat kernel: reference initializes Conv2d(1x1) to (ones - I) * coef
    compat = (jnp.ones((c, c)) - jnp.eye(c)) * xyz_coef

    def shifted(a, dy, dx):
        """Roll with zero fill (= the reference's zero-padded unfold: out-
        of-image window elements contribute nothing)."""
        r = jnp.roll(a, (dy, dx), axis=(1, 2))
        if dy > 0:
            r = r.at[:, :dy].set(0)
        elif dy < 0:
            r = r.at[:, dy:].set(0)
        if dx > 0:
            r = r.at[:, :, :dx].set(0)
        elif dx < 0:
            r = r.at[:, :, dx:].set(0)
        return r

    sm = softmax
    for _ in range(iters):
        sm = sm * mf
        msg = jnp.zeros_like(sm)
        for dy, dx in _window_offsets(lcn_h, lcn_w):
            x_r = shifted(xyz, dy, dx)
            s_r = shifted(sm, dy, dx)
            d2 = jnp.sum((x_r - xyz) ** 2, axis=-1, keepdims=True)
            msg = msg + jnp.exp(-d2 / den) * s_r
        reweight = jnp.einsum("bhwc,cd->bhwd", msg, compat) + sm
        sm = jax.nn.softmax(reweight, axis=-1)
    return sm


@partial(jax.jit,
         static_argnames=("num_class", "border_size", "kern_conn",
                          "background_class"))
def border_mask(
    labels: jax.Array,       # [B, H, W] int32 class labels
    num_class: int,
    border_size: int = 1,
    kern_conn: int = 4,
    background_class: Optional[int] = 0,
) -> jax.Array:
    """Binary border mask: 1 where class intersections occur within
    `border_size` erosions (reference borderMask.forward). Returns
    [B, H, W] bool."""
    assert kern_conn in (4, 8)
    oh = jax.nn.one_hot(labels, num_class, dtype=jnp.float32)  # [B,H,W,C]
    if background_class is not None:
        bg = oh[..., background_class:background_class + 1]
        oh = oh + bg                       # add bg to every channel...
        oh = oh.at[..., background_class].set(
            oh[..., background_class] - bg[..., 0])  # ...except itself

    if kern_conn == 4:
        offs = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    else:
        offs = _window_offsets(3, 3)
    ksum = float(len(offs))

    ero = oh
    for _ in range(border_size):
        acc = jnp.zeros_like(ero)
        for dy, dx in offs:
            # conv2d with zero padding: out-of-image contributions are 0
            r = jnp.roll(ero, (dy, dx), axis=(1, 2))
            if dy > 0:
                r = r.at[:, :dy].set(0)
            elif dy < 0:
                r = r.at[:, dy:].set(0)
            if dx > 0:
                r = r.at[:, :, :dx].set(0)
            elif dx < 0:
                r = r.at[:, :, dx:].set(0)
            acc = acc + r
        ero = (acc == ksum).astype(jnp.float32)

    bodies = (ero.sum(-1) == 1)
    if background_class is not None:
        bodies = bodies | (ero[..., background_class] == 1)
    return ~bodies
