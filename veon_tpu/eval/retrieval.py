"""POP-3D language retrieval metrics.

Semantics of `models/detectors/veon_temporal.py:331-356`
(compute_single_retrieval) + `datasets/nuscenes_dataset_retrieval.py:123-139`:
cosine similarity of per-voxel CLIP features against a free-text prompt
embedding, scored as average precision (sklearn-compatible AP) over annotated
points, and over the camera-visible subset ("mAP-visible").
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """sklearn.metrics.average_precision_score for binary labels.

    AP = sum_k (R_k - R_{k-1}) * P_k over descending-score thresholds.
    """
    labels = np.asarray(labels).astype(np.float64).reshape(-1)
    scores = np.asarray(scores).astype(np.float64).reshape(-1)
    n_pos = labels.sum()
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-scores, kind="stable")
    labels = labels[order]
    scores = scores[order]
    # group tied scores (threshold-based like sklearn)
    distinct = np.where(np.diff(scores))[0]
    idxs = np.r_[distinct, labels.size - 1]
    tp = np.cumsum(labels)[idxs]
    fp = (idxs + 1) - tp
    precision = tp / (tp + fp)
    recall = tp / n_pos
    prev_recall = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - prev_recall) * precision))


def retrieval_scores(
    occ_feat: np.ndarray,
    prompt_embedding: np.ndarray,
    point_indices: np.ndarray,
    matching_points: np.ndarray,
    anno: np.ndarray,
) -> Dict[str, float]:
    """Per-prompt retrieval AP.

    Args:
      occ_feat: (X, Y, Z, C) per-voxel CLIP features (channel-last).
      prompt_embedding: (C,) text embedding of the prompt.
      point_indices: (P, 3) voxel indices of annotated points.
      matching_points: (M,) indices into P of camera-visible points.
      anno: (P,) binary ground-truth relevance.

    Returns {"map": AP, "map_visible": AP over visible subset}.
    """
    idx = point_indices.astype(np.int64)
    feats = occ_feat[idx[:, 0], idx[:, 1], idx[:, 2]]  # (P, C)
    q = prompt_embedding.reshape(-1)
    denom = np.maximum(np.linalg.norm(feats, axis=-1) * np.linalg.norm(q), 1e-8)
    cos = feats @ q / denom
    out = {"map": average_precision(anno, cos)}
    m = matching_points.astype(np.int64)
    out["map_visible"] = average_precision(anno[m], cos[m])
    return out
