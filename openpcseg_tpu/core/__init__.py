from .tensor import (  # noqa: F401
    DevoxTable,
    PointBuffer,
    SparseLevel,
    VoxelPyramid,
)
from .geometry import build_pyramid  # noqa: F401
from .batch import VoxelBatch, voxelize_points_batch  # noqa: F401
