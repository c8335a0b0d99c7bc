"""Loss-zoo parity vs torch functional ground truth."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rtdm_tpu.train.losses import (
    cross_entropy,
    focal_loss,
    inverse_frequency_class_weights,
    label_smoothing_cross_entropy,
)


@pytest.fixture
def batch(rng):
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(16,)).astype(np.int64)
    return logits, labels


def test_cross_entropy_matches_torch(batch):
    logits, labels = batch
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels)).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_cross_entropy_class_weights(batch):
    logits, labels = batch
    w = np.array([1.0, 2.0, 0.5, 1.5, 3.0], np.float32)
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), weights=w)
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels),
                           weight=torch.from_numpy(w)).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_label_smoothing_matches_torch(batch):
    logits, labels = batch
    got = label_smoothing_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels), epsilon=0.1)
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels),
                           label_smoothing=0.1).item()
    # torch's label_smoothing distributes eps over all classes including the
    # target; the reference's formulation (label_smoothing.py:41-138) uses
    # eps*mean(-logp) + (1-eps)*nll, identical for uniform smoothing.
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_focal_gamma_zero_equals_ce(batch):
    logits, labels = batch
    f = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0)
    ce = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(f), float(ce), rtol=1e-5)


def test_focal_downweights_easy(batch):
    logits, labels = batch
    f2 = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
    ce = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    assert float(f2) < float(ce)


def test_reduction_none_sums_to_mean(batch):
    logits, labels = batch
    per = label_smoothing_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels),
                                        reduction="none")
    mean = label_smoothing_cross_entropy(jnp.asarray(logits),
                                         jnp.asarray(labels))
    assert per.shape == (16,)
    np.testing.assert_allclose(float(jnp.mean(per)), float(mean), rtol=1e-6)


def test_ignore_index(batch):
    logits, labels = batch
    labels2 = labels.copy()
    labels2[:4] = -100
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels2))
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels2),
                           ignore_index=-100).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_inverse_frequency_weights():
    """Reference-exact get_class_weights (model/focal_loss.py:51-63):
    total/(nc*count), then normalized to sum 1."""
    labels = [0] * 80 + [1] * 10 + [2] * 10
    w = inverse_frequency_class_weights(labels, 3)
    assert w[0] < w[1] == w[2]
    raw = np.array([100 / (3 * 80), 100 / (3 * 10), 100 / (3 * 10)])
    np.testing.assert_allclose(w, raw / raw.sum(), rtol=1e-6)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)


def test_focal_honors_ignore_index(batch):
    """Padded (-100) rows must not contribute focal loss — same contract
    as the CE/label-smoothing siblings (reference focal wraps
    nn.CrossEntropyLoss, which honors ignore_index)."""
    logits, labels = batch
    from rtdm_tpu.train.losses import focal_loss
    base = focal_loss(logits, labels, gamma=1.5)
    padded_logits = np.concatenate([logits, logits[:3] * 7.0])
    padded_labels = np.concatenate([labels, np.full(3, -100)])
    with_pad = focal_loss(padded_logits, padded_labels, gamma=1.5)
    np.testing.assert_allclose(with_pad, base, rtol=1e-6)


def test_reduction_sum_is_real(batch):
    """reduction='sum' must return the sum, not silently fall back to
    mean, for all three losses."""
    from rtdm_tpu.train.losses import (cross_entropy, focal_loss,
                                       label_smoothing_cross_entropy)
    logits, labels = batch
    for fn in (cross_entropy, label_smoothing_cross_entropy, focal_loss):
        none = np.asarray(fn(logits, labels, reduction="none"))
        s = float(fn(logits, labels, reduction="sum"))
        np.testing.assert_allclose(s, none.sum(), rtol=1e-6)
        import pytest as _pt
        with _pt.raises(ValueError, match="reduction"):
            fn(logits, labels, reduction="bogus")
