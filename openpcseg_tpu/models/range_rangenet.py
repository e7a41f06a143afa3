"""RangeNet++ (Darknet53 backbone), TPU-native (NHWC).

Re-implementation of the reference RangeNet
(reference: pcseg/model/segmentor/range/rangenet/model/semantic/
rangenet.py:14-130 and module/darknet.py): Darknet residual encoder with
width-only downsampling (stride (1,2), darknet.py:125-131), skip-recording
per output-stride, width-only transposed-conv decoder (kernel (1,4), stride
(1,2), darknet.py:232-249) with additive skips, dropout + 3x3 head.
The reference's optional CRF post-processing (postproc/CRF.py) is off in
its config and not reproduced.

Input: the first 5 of the 6 scan channels (darknet.py:60-64 input_idxs).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

MODEL_BLOCKS = {21: [1, 1, 2, 2, 1], 53: [1, 2, 8, 8, 4]}
LEAKY = 0.1


def _bn(train):
    # torch momentum bn_d=0.01 -> flax momentum 0.99
    return nn.BatchNorm(use_running_average=not train, momentum=0.99)


class DarkBasicBlock(nn.Module):
    """1x1 squeeze + 3x3 expand residual (darknet.py:5-34)."""

    planes: tuple  # (squeeze, expand)

    @nn.compact
    def __call__(self, x, train: bool):
        out = nn.Conv(self.planes[0], (1, 1), use_bias=False)(x)
        out = _bn(train)(out)
        out = jax.nn.leaky_relu(out, LEAKY)
        out = nn.Conv(self.planes[1], (3, 3), use_bias=False)(out)
        out = _bn(train)(out)
        out = jax.nn.leaky_relu(out, LEAKY)
        return out + x


class RangeNet(nn.Module):
    model_cfgs: Any
    num_class: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    MODALITY = "range"

    @nn.compact
    def __call__(self, scan: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        blocks = MODEL_BLOCKS[self.model_cfgs.get("DARKNET_LAYERS", 53)]
        drop = lambda y: nn.Dropout(0.01, deterministic=not train)(y)

        x = scan[..., :5]
        x = nn.Conv(32, (3, 3), use_bias=False)(x)
        x = _bn(train)(x)
        x = jax.nn.leaky_relu(x, LEAKY)

        skips: Dict[int, jax.Array] = {}
        os = 1
        widths = [64, 128, 256, 512, 1024]
        for wi, (width, n) in enumerate(zip(widths, blocks)):
            skips[os] = x
            os *= 2
            # width-only downsample (darknet.py:127-130)
            x = nn.Conv(width, (3, 3), strides=(1, 2), use_bias=False)(x)
            x = _bn(train)(x)
            x = jax.nn.leaky_relu(x, LEAKY)
            for _ in range(n):
                x = DarkBasicBlock((width // 2, width))(x, train)
            x = drop(x)

        # decoder (darknet.py:183-270): width-only transposed convs; the
        # decoder residual blocks EXPAND to 2*width then squeeze back
        # (dec planes [2w, w], darknet.py:247)
        for width in (512, 256, 128, 64, 32):
            x = nn.ConvTranspose(
                width, (1, 4), strides=(1, 2), padding="SAME",
                use_bias=True)(x)
            x = _bn(train)(x)
            x = jax.nn.leaky_relu(x, LEAKY)
            x = DarkBasicBlock((2 * width, width))(x, train)
            os //= 2
            # skips are detached in the reference (darknet.py run_layer)
            x = x + jax.lax.stop_gradient(skips[os])

        x = drop(x)
        logits = nn.Conv(self.num_class, (3, 3), name="head")(drop(x))
        return logits, []
