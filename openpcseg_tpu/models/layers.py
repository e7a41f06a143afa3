"""Sparse network building blocks (flax.linen).

TPU-native counterparts of the reference's torchsparse layers:
- SparseConv        <- spnn.Conv3d (reference: torchsparse nn/modules/conv.py)
- MaskedBatchNorm   <- sparse BatchNorm/SyncBatchNorm via fapply
  (reference: minkunet.py:23-29; SyncBN over ranks at train.py:170-171).
  Normalizes over *valid lanes only* (padding must not pollute statistics —
  the reference has no padding so plain BN suffices there); cross-device
  batch stats go through lax.pmean over the data axis, replacing
  nn.SyncBatchNorm's NCCL allreduce.
- BasicConvBlock / BasicDeconvBlock / ResidualBlock / Bottleneck
  (reference: minkunet.py:31-183).

All layers take explicit kernel maps + validity masks from the precomputed
VoxelPyramid; they never build geometry themselves.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.kmap import kernel_offsets
from ..ops.sparse_conv import (
    sparse_conv,
    sparse_conv_1x1,
    sparse_conv_up2,
    window_subm_conv,
)

# submanifold conv implementation:
#   "pallas"  — soft-one-hot MXU window conv kernel (ops/pallas_conv.py),
#               TPU only; the default on TPU backends
#   "window"  — XLA z-column window-gather conv (ops/sparse_conv.py)
#   "gather"  — reference 26-row-gather formulation (parity oracle)
# Override via env OPENPCSEG_CONV_IMPL for A/B benchmarking.
import os as _os

CONV_IMPL = _os.environ.get("OPENPCSEG_CONV_IMPL", "auto")
# pallas kernels for the k2/s2 strided/transposed convs (ops/pallas_updown.py).
# OPENPCSEG_UPDOWN_PALLAS: 1 force-on, 0 force-off, auto = on when the model
# dispatch resolves to the pallas impl (i.e. a real TPU backend). Default
# auto since the round-5 TPU A/B won at both batch sizes: 5.04 vs 4.81
# scans/s/chip at b1, 4.82 vs 4.59 dup-b2 (logs/tpu_queue_r05c.log).
_UPDOWN_ENV = _os.environ.get("OPENPCSEG_UPDOWN_PALLAS", "auto")
UPDOWN_PALLAS = _UPDOWN_ENV == "1" or _UPDOWN_ENV == "auto"


def _resolve_conv_impl() -> str:
    global CONV_IMPL
    if CONV_IMPL == "auto":
        # the v3 pallas window kernel (ops/pallas_conv.py: HBM w3 windows +
        # single one-hot per column + fused backward) wins end-to-end on
        # TPU: 4.23 vs 2.89 scans/s/chip on bench.py (round 3). CPU/interp
        # runs and tiny-Cin convs keep the XLA window conv.
        import jax
        CONV_IMPL = ("pallas" if jax.devices()[0].platform not in
                     ("cpu",) else "window")
    return CONV_IMPL


def _num_offsets(kernel_size) -> int:
    return len(kernel_offsets(kernel_size))


class SparseConv(nn.Module):
    """Sparse convolution over a precomputed kernel map.

    kernel map semantics: idx[K, N_out] into the input feature rows, -1 miss.
    For submanifold convs pass the level's subm_kmap (the transposed map for
    the backward pass is derived by offset reversal); for strided convs pass
    the coarser level's down_kmap with kmap_t = the finer level's up_kmap;
    for transposed convs the reverse (see core/geometry.py and
    ops/sparse_conv.py's scatter-free custom VJP).
    """

    features: int
    kernel_size: int | tuple = 3
    use_bias: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    # set True for transposed k2/s2 convs whose kmap fires exactly one
    # offset per output (SparseLevel.up_one_hot): one-gather fast path
    one_hot_kmap: bool = False
    # set True for strided k2/s2 down convs whose kmap is the parity pair
    # map (transpose of a one-hot up map, geometry._updown_from_inverse):
    # enables the pallas pair-gather kernel under OPENPCSEG_UPDOWN_PALLAS
    pair_kmap: bool = False

    @nn.compact
    def __call__(self, feats: jax.Array, kmap: Optional[jax.Array],
                 out_valid: jax.Array,
                 kmap_t: Optional[jax.Array] = None) -> jax.Array:
        cin = feats.shape[-1]
        k = _num_offsets(self.kernel_size)
        # fan-in = K * Cin, matching torchsparse's kaiming-style init domain
        init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
        if k == 1:
            w = self.param("kernel", init, (cin, self.features))
            out = sparse_conv_1x1(feats, w, out_valid,
                                  compute_dtype=self.compute_dtype)
        else:
            w = self.param("kernel", init, (k * cin, self.features))
            w = w.reshape(k, cin, self.features)
            assert kmap is not None and kmap.shape[0] == k, (
                f"kmap K={None if kmap is None else kmap.shape[0]} != {k}"
            )
            ks = self.kernel_size
            all_odd = (ks % 2 == 1) if isinstance(ks, int) else all(
                s % 2 == 1 for s in ks)
            # identity center offset exists only for submanifold convs
            # (kmap_t None => offset-symmetric same-coordinate-set conv);
            # a strided k=3 conv has an all-odd kernel but no identity row
            center = k // 2 if (all_odd and kmap_t is None) else None
            impl = _resolve_conv_impl()
            if (impl in ("window", "pallas") and self.one_hot_kmap
                    and k == 8 and kmap_t is not None):
                if impl == "pallas" and UPDOWN_PALLAS and cin >= 16:
                    from ..ops.pallas_updown import pallas_conv_up2
                    out = pallas_conv_up2(feats, w, kmap, out_valid, kmap_t,
                                          compute_dtype=self.compute_dtype)
                else:
                    out = sparse_conv_up2(feats, w, kmap, out_valid, kmap_t,
                                          compute_dtype=self.compute_dtype)
            elif (impl == "pallas" and UPDOWN_PALLAS and self.pair_kmap
                    and k == 8 and kmap_t is not None and cin >= 16):
                from ..ops.pallas_updown import pallas_conv_down2
                out = pallas_conv_down2(feats, w, kmap, out_valid, kmap_t,
                                        compute_dtype=self.compute_dtype)
            elif (impl == "pallas" and ks == 3 and kmap_t is None
                    and kmap.shape[1] == feats.shape[0]
                    # tiny-Cin convs (the 4-channel stem entry) stay on the
                    # XLA path: sub-8-lane slot slices aren't worth a kernel
                    and cin >= 16):
                from ..ops.pallas_conv import pallas_window_subm_conv
                out = pallas_window_subm_conv(
                    feats, w, kmap, out_valid, kernel_offsets(ks),
                    compute_dtype=self.compute_dtype)
            elif (impl in ("window", "pallas") and all_odd and kmap_t is None
                    and kmap.shape[1] == feats.shape[0]):
                out = window_subm_conv(
                    feats, w, kmap, out_valid, kernel_offsets(ks),
                    compute_dtype=self.compute_dtype)
            else:
                out = sparse_conv(feats, w, kmap, out_valid, kmap_t=kmap_t,
                                  center=center,
                                  compute_dtype=self.compute_dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + jnp.where(out_valid[:, None], b, 0.0)
        # algorithmic FLOPs of this conv (2 * matched-pair count * Cin *
        # Cout — the gather-GEMM work a hit-exact implementation performs;
        # reference analog: torchsparse nbsizes totals). Collected only
        # when the caller makes the "flops" collection mutable (bench.py
        # MFU accounting); dead code under normal train/eval steps.
        hits = (jnp.sum(out_valid) if k == 1
                else jnp.sum(kmap >= 0)).astype(jnp.float32)
        self.sow("flops", "conv", 2.0 * hits * cin * self.features,
                 reduce_fn=lambda a, b: a + b,
                 init_fn=lambda: jnp.float32(0.0))
        # per-conv inventory for the speed-of-light model
        # (tools/perf/sol_model.py): [hits, cin, cout, n_rows, k]. Separate
        # collection so bench.py's "flops" leaf-sum stays a pure total.
        self.sow("convinfo", "c",
                 jnp.stack([hits, jnp.float32(cin),
                            jnp.float32(self.features),
                            jnp.float32(out.shape[0]), jnp.float32(k)]))
        return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid lanes with optional cross-device stat sync.

    Follows torch BN semantics (reference minkunet.py:23-29): biased variance
    for normalization, unbiased for the running estimate, momentum 0.1
    (torch) == EMA decay 0.9. `axis_name`, when set and inside shard_map /
    pmap, averages batch statistics across the data axis — the TPU
    equivalent of SyncBatchNorm (reference train.py:170-171).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, valid: jax.Array,
                 use_running_average: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            m = valid.astype(jnp.float32)[:, None]
            cnt = m.sum()
            s1 = (xf * m).sum(axis=0)
            s2 = (xf * xf * m).sum(axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        y = jnp.where(valid[:, None], y, 0.0)
        return y.astype(x.dtype)


class BasicConvBlock(nn.Module):
    """conv -> BN -> ReLU (reference minkunet.py:31-55)."""

    features: int
    kernel_size: int | tuple = 3
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.float32
    pair_kmap: bool = False

    @nn.compact
    def __call__(self, feats, kmap, out_valid, train: bool, kmap_t=None):
        x = SparseConv(self.features, self.kernel_size,
                       pair_kmap=self.pair_kmap,
                       compute_dtype=self.compute_dtype)(
            feats, kmap, out_valid, kmap_t)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, out_valid, not train)
        return jax.nn.relu(x)


class ResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + shortcut (reference minkunet.py:83-129).

    Operates within one level (submanifold, stride 1). `expansion` = 1.
    """

    features: int
    kernel_size: int | tuple = 3
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, feats, kmap, valid, train: bool):
        x = SparseConv(self.features, self.kernel_size,
                       compute_dtype=self.compute_dtype)(feats, kmap, valid)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, valid, not train)
        x = jax.nn.relu(x)
        x = SparseConv(self.features, self.kernel_size,
                       compute_dtype=self.compute_dtype)(x, kmap, valid)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, valid, not train)

        if feats.shape[-1] == self.features:
            sc = feats
        else:
            sc = SparseConv(self.features, 1,
                            compute_dtype=self.compute_dtype)(feats, None, valid)
            sc = MaskedBatchNorm(axis_name=self.axis_name)(sc, valid, not train)
        return jax.nn.relu(x + sc)


class Bottleneck(nn.Module):
    """1x1 -> kxk -> 1x1 with 4x expansion (reference minkunet.py:132-183)."""

    features: int
    kernel_size: int | tuple = 3
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, feats, kmap, valid, train: bool):
        out_ch = self.features * self.expansion
        x = SparseConv(self.features, 1,
                       compute_dtype=self.compute_dtype)(feats, None, valid)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, valid, not train)
        x = jax.nn.relu(x)
        x = SparseConv(self.features, self.kernel_size,
                       compute_dtype=self.compute_dtype)(x, kmap, valid)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, valid, not train)
        x = jax.nn.relu(x)
        x = SparseConv(out_ch, 1,
                       compute_dtype=self.compute_dtype)(x, None, valid)
        x = MaskedBatchNorm(axis_name=self.axis_name)(x, valid, not train)

        if feats.shape[-1] == out_ch:
            sc = feats
        else:
            sc = SparseConv(out_ch, 1,
                            compute_dtype=self.compute_dtype)(feats, None, valid)
            sc = MaskedBatchNorm(axis_name=self.axis_name)(sc, valid, not train)
        return jax.nn.relu(x + sc)


class _ScanBody(nn.Module):
    """(carry, broadcast...) -> (carry, None) adapter for nn.scan over a
    residual block whose in/out channel counts match."""

    block_cls: Callable
    features: int
    axis_name: Optional[str]
    compute_dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, kmap, valid, train: bool):
        x = self.block_cls(
            self.features, axis_name=self.axis_name,
            compute_dtype=self.compute_dtype)(carry, kmap, valid, train)
        return x, None


class StackedBlocks(nn.Module):
    """`n` identical channel-preserving residual blocks traced and compiled
    ONCE via nn.scan over axis-0-stacked parameters, instead of n unrolled
    copies in the jaxpr/HLO.

    Valid only when every block is channel-preserving end to end, i.e. its
    input channels == `features * block expansion` (identity shortcut) —
    blocks 2..n of a UNet stage; for Bottleneck (expansion=4) the carried
    width is features*4. The stage's first block (channel change, conv
    shortcut) stays unrolled at the call site. The
    kernel map / validity mask are loop-invariant (nn.broadcast); batch
    stats stack on axis 0 and update per-iteration like the unrolled form.
    Cuts the MinkUNet mk34 train-step trace+compile roughly in half
    (ROADMAP round-4 compile-time attack; the reference has no analog —
    torch re-traces nothing, but XLA pays per-instruction compile cost)."""

    block_cls: Callable
    features: int
    n: int
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, kmap, valid, train: bool):
        scanned = nn.scan(
            _ScanBody,
            variable_axes={"params": 0, "batch_stats": 0, "flops": 0,
                           "convinfo": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            length=self.n,
        )(self.block_cls, self.features, self.axis_name, self.compute_dtype)
        x, _ = scanned(feats, kmap, valid, train)
        return x


def repeated_blocks(block_cls, features, n, axis_name, compute_dtype,
                    x, kmap, valid, train):
    """First block unrolled (it may change channel count / own a conv
    shortcut), remaining n-1 through the single-compile StackedBlocks scan.

    OPENPCSEG_SCAN_BLOCKS=0 restores full unrolling — a COMPILE-TIME A/B
    escape hatch only: nn.scan's split_rngs draws per-iteration init RNGs
    differently from unrolled modules, so the two arms start from different
    initializations (compare accuracy by transplanting params, as
    tests/test_stacked_blocks.py does, not by seed-matched runs), and their
    checkpoint layouts are incompatible (merge_matching fails loudly on a
    mismatch — utils/checkpoint.py _scan_layout_mismatch)."""
    x = block_cls(features, axis_name=axis_name,
                  compute_dtype=compute_dtype)(x, kmap, valid, train)
    rest = n - 1
    if rest <= 0:
        return x
    if _os.environ.get("OPENPCSEG_SCAN_BLOCKS", "1") == "0" or rest == 1:
        for _ in range(rest):
            x = block_cls(features, axis_name=axis_name,
                          compute_dtype=compute_dtype)(x, kmap, valid, train)
        return x
    return StackedBlocks(block_cls, features, rest, axis_name,
                         compute_dtype)(x, kmap, valid, train)


BLOCKS: dict[str, Callable] = {
    "ResBlock": ResidualBlock,
    "Bottleneck": Bottleneck,
}
