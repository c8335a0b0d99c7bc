"""Classification loss zoo.

TPU-native re-design of the reference's classifier losses:
- label-smoothing CE (reference: code/disaster_detection/model/label_smoothing.py:41-138,
  eps*smooth_loss + (1-eps)*nll with ignore_index masking)
- focal loss with optional per-class alpha (model/focal_loss.py:6-63)
- inverse-frequency class weights (model/focal_loss.py get_class_weights)

All functions take LOGITS (the framework trains on logits; the reference's
quirk of softmax-inside-forward is reproduced only on the inference path).
Everything is pure jnp and jit/vmap/grad-safe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  weights: Optional[jax.Array] = None,
                  ignore_index: int = -100,
                  reduction: str = "mean") -> jax.Array:
    """CE over valid targets, with optional per-class weights."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    if weights is not None:
        w = jnp.asarray(weights, jnp.float32)[safe_labels]
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    if reduction == "none":
        return nll * w
    if reduction == "sum":
        return jnp.sum(nll * w)
    if reduction != "mean":
        raise ValueError(f"unknown reduction '{reduction}'")
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def label_smoothing_cross_entropy(logits: jax.Array, labels: jax.Array,
                                  epsilon: float = 0.1,
                                  ignore_index: int = -100,
                                  reduction: str = "mean") -> jax.Array:
    """eps * mean(-logp) + (1-eps) * nll, masked at ignore_index."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    per_example = epsilon * smooth + (1.0 - epsilon) * nll
    per_example = jnp.where(valid, per_example, 0.0)
    if reduction == "none":
        return per_example
    if reduction == "sum":
        return jnp.sum(per_example)
    if reduction != "mean":
        raise ValueError(f"unknown reduction '{reduction}'")
    return jnp.sum(per_example) / jnp.maximum(jnp.sum(valid), 1)


def focal_loss(logits: jax.Array, labels: jax.Array,
               gamma: float = 2.0,
               alpha: Optional[jax.Array] = None,
               ignore_index: int = -100,
               reduction: str = "mean") -> jax.Array:
    """(1-pt)^gamma * CE, with optional per-class alpha weighting.
    `ignore_index` rows are excluded, matching the CE/label-smoothing
    siblings (the reference focal wraps nn.CrossEntropyLoss, which
    honors ignore_index; model/focal_loss.py:6-63)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-nll)
    focal = jnp.power(1.0 - pt, gamma) * nll
    if alpha is not None:
        focal = focal * jnp.asarray(alpha, jnp.float32)[safe_labels]
    focal = jnp.where(valid, focal, 0.0)
    if reduction == "none":
        return focal
    if reduction == "sum":
        return jnp.sum(focal)
    if reduction != "mean":
        raise ValueError(f"unknown reduction '{reduction}'")
    return jnp.sum(focal) / jnp.maximum(jnp.sum(valid), 1)


def inverse_frequency_class_weights(labels: Sequence[int],
                                    num_classes: int) -> np.ndarray:
    """total / (num_classes * count_c), NORMALIZED to sum 1 — the
    reference's get_class_weights (model/focal_loss.py:51-63 ends with
    `weights / weights.sum()`; omitting it scales focal loss ~num_classes
    times larger than the reference)."""
    counts = np.bincount(np.asarray(labels),
                         minlength=num_classes).astype(np.float64)
    counts = np.maximum(counts, 1.0)
    w = counts.sum() / (num_classes * counts)
    return (w / w.sum()).astype(np.float32)


def make_classification_loss(name: str,
                             label_smoothing: float = 0.1,
                             focal_gamma: float = 2.0,
                             class_weights: Optional[np.ndarray] = None):
    """Loss factory matching the reference trainer choices
    (train.py:190-211: 'crossentropy' | 'label_smoothing' | 'focal')."""
    name = name.lower().replace("-", "_")
    if name in ("ce", "crossentropy", "cross_entropy"):
        return lambda logits, labels, reduction="mean": cross_entropy(
            logits, labels, weights=class_weights, reduction=reduction)
    if name in ("label_smoothing", "labelsmoothing", "smooth",
                "label_smoothing_ce"):
        return (lambda logits, labels, reduction="mean":
                label_smoothing_cross_entropy(
                    logits, labels, epsilon=label_smoothing,
                    reduction=reduction))
    if name == "focal":
        return lambda logits, labels, reduction="mean": focal_loss(
            logits, labels, gamma=focal_gamma, alpha=class_weights,
            reduction=reduction)
    raise ValueError(f"unknown loss '{name}'")
