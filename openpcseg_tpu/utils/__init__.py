from .metrics import (  # noqa: F401
    confusion_matrix,
    crop_hist,
    miou_from_hist,
    per_class_iou,
)
