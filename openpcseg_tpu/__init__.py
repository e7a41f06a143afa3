"""OpenPCSeg-TPU: a TPU-native LiDAR point-cloud segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
PJLab-ADG/OpenPCSeg (reference layout: /root/reference). The compute path is
pure JAX (jit/pjit/shard_map + Pallas kernels); sparse 3D convolution runs on
fixed-capacity padded voxel buffers so every step compiles to a single static
XLA program on the MXU.

Subpackages
-----------
- ``ops``:      the sparse compute engine (dedup, kernel maps, sparse conv,
                voxelize/devoxelize, segment reductions). TPU-native
                replacement for the reference's vendored torchsparse CUDA
                backend (reference: package/torchsparse.zip).
- ``core``:     SparseVoxels / PointBuffer pytrees and multi-level geometry.
- ``models``:   segmentor model zoo (MinkUNet, Cylinder3D, SPVCNN, RPVNet,
                range-view CNNs) in flax.linen.
- ``losses``:   CE / Lovasz / focal / dice ... loss dispatcher
                (reference: pcseg/loss/__init__.py).
- ``optim``:    optax-based optimizer + LR schedule builders
                (reference: pcseg/optim/__init__.py).
- ``data``:     dataset readers, augmentations, fixed-capacity views
                (reference: pcseg/data/).
- ``parallel``: device mesh + data-parallel train step (replaces the
                reference's DDP/NCCL layer, reference: train.py:215-219).
- ``engine``:   Trainer harness (train/eval loops, checkpointing, metrics).
"""

__version__ = "0.1.0"
