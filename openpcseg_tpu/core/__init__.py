from .tensor import (  # noqa: F401
    DevoxTable,
    PointBuffer,
    SparseLevel,
    VoxelPyramid,
)
from .geometry import build_pyramid  # noqa: F401
from .batch import (  # noqa: F401
    VoxelBatch,
    cart2polar,
    cylinder_points_batch,
    voxelize_points_batch,
)
