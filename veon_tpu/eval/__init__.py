from .miou import MIoUMetric, confusion_hist, per_class_iou
from .retrieval import average_precision, retrieval_scores

__all__ = [
    "MIoUMetric",
    "confusion_hist",
    "per_class_iou",
    "average_precision",
    "retrieval_scores",
]
