"""Data layer: dataset registry + loader factory.

Mirrors the reference's build_dataloader surface
(reference: pcseg/data/__init__.py:46-154) mapping (modality, dataset) to a
view class; distribution is handled by slicing the global batch across the
mesh (parallel/mesh.py) instead of a DistributedSampler.
"""
from __future__ import annotations

from .synthetic import pad_scan, synthetic_batch, synthetic_scan  # noqa: F401
from .semantickitti import SemantickittiDataset  # noqa: F401
from .voxel_view import BatchLoader, SemkittiVoxelDataset, collate  # noqa: F401
from .range_view import SemkittiRangeViewDataset, synthetic_range_batch  # noqa: F401
from .fusion_view import SemkittiFusionDataset, build_fusion_range_image  # noqa: F401
from .waymo import (  # noqa: F401
    WAYMO_CLASS_NAMES,
    WaymoDataset,
    WaymoFusionDataset,
    WaymoInferDataset,
    WaymoVoxelDataset,
)
from .nuscenes import (  # noqa: F401
    NuscenesDataset,
    NuscFusionDataset,
    NuscRangeViewDataset,
    NuscVoxelDataset,
)
from . import nuscenes_meta, semantickitti_meta  # noqa: F401

_VIEWS = {
    ("voxel", "semantickitti"): SemkittiVoxelDataset,
    ("voxel", "scribblekitti"): SemkittiVoxelDataset,
    # fusion modality (SPVCNN ignores the range extras, RPVNet uses them)
    ("fusion", "semantickitti"): SemkittiFusionDataset,
    ("fusion", "scribblekitti"): SemkittiFusionDataset,
    # cylinder modality: the host side only loads/augments/pads points; the
    # cylindrical partition runs on device (core/batch.py
    # cylinder_points_batch), so the generic padded view serves it.
    ("cylinder", "semantickitti"): SemkittiVoxelDataset,
    ("cylinder", "scribblekitti"): SemkittiVoxelDataset,
    ("range", "semantickitti"): SemkittiRangeViewDataset,
    ("range", "scribblekitti"): SemkittiRangeViewDataset,
    ("voxel", "waymo"): WaymoVoxelDataset,
    ("cylinder", "waymo"): WaymoVoxelDataset,
    ("fusion", "waymo"): WaymoFusionDataset,
    # nuScenes-lidarseg: the reference dispatches these names but ships no
    # classes (pcseg/data/__init__.py:59-87); implemented in data/nuscenes.py
    ("voxel", "nuscenes"): NuscVoxelDataset,
    ("cylinder", "nuscenes"): NuscVoxelDataset,
    ("range", "nuscenes"): NuscRangeViewDataset,
    ("fusion", "nuscenes"): NuscFusionDataset,
}


def num_classes_for(dataset: str) -> int:
    """(reference train.py:157-163)"""
    return {"nuscenes": 17, "semantickitti": 20, "scribblekitti": 20,
            "waymo": 23}[dataset]


def dataset_meta(dataset: str):
    """Per-dataset (class_names, cls_num_pts) for loss construction
    (reference pcseg/loss/__init__.py:15-26 takes both; the reference never
    wires them — here WCELoss/GroupSoftmax get the right tables per
    dataset). cls_num_pts is None where no published table exists."""
    from .nuscenes_meta import CLASS_NAMES as NUSC_CLASS_NAMES
    from .semantickitti_meta import CLASS_NAMES, CLS_NUM_PTS

    return {
        "semantickitti": (CLASS_NAMES, CLS_NUM_PTS),
        "scribblekitti": (CLASS_NAMES, CLS_NUM_PTS),
        "waymo": (WAYMO_CLASS_NAMES, None),
        "nuscenes": (NUSC_CLASS_NAMES, None),
    }.get(dataset, (None, None))


def build_dataloader(
    data_cfgs,
    modality: str,
    batch_size: int,
    *,
    training: bool = True,
    root_path: str | None = None,
    point_cap: int = 131072,
    num_workers: int = 4,
    seed: int = 0,
):
    """Returns (dataset, loader). Raises KeyError for unwired combos."""
    key = (modality, data_cfgs.DATASET)
    if key not in _VIEWS:
        raise NotImplementedError(
            f"no dataset view for modality={modality!r}, "
            f"dataset={data_cfgs.DATASET!r}; available: {sorted(_VIEWS)}"
        )
    dataset = _VIEWS[key](
        data_cfgs, training=training, root_path=root_path,
        point_cap=point_cap, seed=seed,
    )
    # per-host input sharding (multi-host DP): each process loads only its
    # slice of every global batch; eval tails are padded to the full global
    # batch with invalid samples so sharded eval shapes stay static
    # (reference DistributedSampler + padded eval sampler,
    # pcseg/data/__init__.py:23-43,106-113)
    import jax

    loader = BatchLoader(
        dataset, batch_size, shuffle=training,
        num_workers=num_workers, seed=seed, drop_last=training,
        pad_last=not training,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    return dataset, loader
