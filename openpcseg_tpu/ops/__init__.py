"""The TPU-native sparse compute engine.

Replaces the reference's vendored torchsparse CUDA backend + range_lib
(reference: package/torchsparse.zip, package/range_lib.zip) with static-shape
JAX/XLA ops over fixed-capacity padded buffers. See module docstrings for
per-op reference citations.
"""
from .coords import (  # noqa: F401
    INT32_MAX,
    Keys,
    UniqueResult,
    lookup_coords,
    lookup_keys,
    make_keys,
    unique_coords,
)
from .kmap import (  # noqa: F401
    build_down_kmap,
    build_downsample,
    build_subm_kmap,
    build_up_kmap,
    kernel_offsets,
)
from .segment import (  # noqa: F401
    segment_count,
    segment_max,
    segment_mean,
    segment_min_index,
    segment_sum,
)
from .sparse_conv import sparse_conv, sparse_conv_1x1  # noqa: F401
from .voxelize import (  # noqa: F401
    devoxelize_indices_weights,
    devoxelize_trilinear,
    voxel_to_point_nearest,
    voxelize_mean,
)
