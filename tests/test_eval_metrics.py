"""Metric math tests vs sklearn / hand-computed values (SURVEY.md section 4:
the reference validates metric math against hand-computed values)."""

import numpy as np
import pytest

from veon_tpu.eval.miou import MIoUMetric, confusion_hist, per_class_iou
from veon_tpu.eval.retrieval import average_precision, retrieval_scores


def test_confusion_hist_and_iou_hand_computed():
    gt = np.array([0, 0, 1, 1, 2, 255])
    pred = np.array([0, 1, 1, 1, 0, 0])
    h = np.asarray(confusion_hist(pred, gt, None, num_classes=3))
    assert h.sum() == 5  # 255 excluded
    assert h[0, 0] == 1 and h[0, 1] == 1 and h[1, 1] == 2 and h[2, 0] == 1
    iou = per_class_iou(h)
    np.testing.assert_allclose(iou[0], 1 / 3)  # tp=1, fn=1, fp=1
    np.testing.assert_allclose(iou[1], 2 / 3)
    np.testing.assert_allclose(iou[2], 0.0)


def test_miou_metric_with_camera_mask():
    m = MIoUMetric(num_classes=3)
    gt = np.array([[0, 1], [2, 2]])
    pred = np.array([[0, 1], [2, 0]])
    mask = np.array([[1, 1], [1, 0]])
    m.add_batch(pred, gt, mask_camera=mask)
    _, iou, miou = m.count_miou()
    # masked voxel (2->0 error) excluded: all perfect
    np.testing.assert_allclose(iou[:2], [1.0, 1.0])


def test_average_precision_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    for _ in range(5):
        labels = rng.integers(0, 2, size=200)
        scores = rng.standard_normal(200)
        # include ties
        scores = np.round(scores, 1)
        want = sklearn_metrics.average_precision_score(labels, scores)
        got = average_precision(labels, scores)
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_retrieval_scores_shapes():
    rng = np.random.default_rng(1)
    occ = rng.standard_normal((5, 5, 3, 8)).astype(np.float32)
    q = rng.standard_normal(8).astype(np.float32)
    pts = rng.integers(0, 3, size=(20, 3))
    match = np.arange(10)
    anno = rng.integers(0, 2, size=20)
    out = retrieval_scores(occ, q, pts, match, anno)
    assert set(out) == {"map", "map_visible"}
    assert 0 <= out["map"] <= 1
