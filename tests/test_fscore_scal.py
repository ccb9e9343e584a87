"""F-score metric + geo/sem scal loss tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from veon_tpu.eval.fscore import FScoreMetric
from veon_tpu.train.losses import geo_scal_loss, sem_scal_loss
from veon_tpu.nn.text import get_templates


def test_fscore_perfect_prediction():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 18, size=(20, 20, 4))
    m = FScoreMetric(use_image_mask=False)
    m.add_batch(gt.copy(), gt.copy())
    out = m.count_fscore()
    assert out["fscore"] == pytest.approx(1.0)
    assert out["accuracy"] == pytest.approx(1.0)


def test_fscore_degrades_with_noise():
    rng = np.random.default_rng(1)
    gt = np.full((20, 20, 4), 17)
    gt[5:10, 5:10, 1] = 4
    pred = np.full((20, 20, 4), 17)
    pred[14:19, 14:19, 1] = 4  # far away
    m = FScoreMetric(use_image_mask=False)
    m.add_batch(pred, gt)
    out = m.count_fscore()
    assert out["fscore"] < 0.5


def test_geo_sem_scal_losses_prefer_correct():
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.integers(0, 18, size=(1, 8, 8, 4)))
    good = jnp.asarray(np.eye(18, dtype=np.float32)[np.asarray(target)] * 10.0)
    bad = jnp.asarray(rng.standard_normal((1, 8, 8, 4, 18)).astype(np.float32))
    assert float(geo_scal_loss(good, target)) < float(geo_scal_loss(bad, target))
    assert float(sem_scal_loss(good, target)) < float(sem_scal_loss(bad, target))


def test_template_sets():
    assert len(get_templates("vild")) == 14
    assert len(get_templates("imagenet")) == 80
