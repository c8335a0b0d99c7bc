"""Box IoU family: plain/GIoU/DIoU/CIoU (pairwise) and wh-IoU matrix.

Semantics match yolov3/utils/utils.py:237-315 (bbox_iou with GIoU/DIoU/
CIoU options; wh_iou) and yolov5/utils/general.py:415 — used by both the
training losses and autoanchor.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def bbox_iou(box1: jax.Array, box2: jax.Array, xywh: bool = True,
             giou: bool = False, diou: bool = False, ciou: bool = False,
             eps: float = 1e-9) -> jax.Array:
    """Pairwise IoU of aligned boxes (..., 4) x (..., 4) -> (...)."""
    if xywh:
        b1x1 = box1[..., 0] - box1[..., 2] / 2
        b1x2 = box1[..., 0] + box1[..., 2] / 2
        b1y1 = box1[..., 1] - box1[..., 3] / 2
        b1y2 = box1[..., 1] + box1[..., 3] / 2
        b2x1 = box2[..., 0] - box2[..., 2] / 2
        b2x2 = box2[..., 0] + box2[..., 2] / 2
        b2y1 = box2[..., 1] - box2[..., 3] / 2
        b2y2 = box2[..., 1] + box2[..., 3] / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
        b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))

    inter_w = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
    inter_h = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    inter = inter_w * inter_h
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if giou:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    c2 = cw ** 2 + ch ** 2 + eps  # convex diagonal squared
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    if diou:
        return iou - rho2 / c2
    # CIoU
    v = (4 / math.pi ** 2) * jnp.square(
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps)))
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def wh_iou_matrix(wh1: jax.Array, wh2: jax.Array) -> jax.Array:
    """(..., N, 2) x (M, 2) -> (..., N, M) IoU of co-centered boxes
    (utils.py:310-315). Leading batch dims on wh1 broadcast, so the loss's
    per-image anchor matching ((B, M, 2) x (na, 2)) reuses this."""
    inter = jnp.prod(jnp.minimum(wh1[..., :, None, :], wh2[..., None, :, :]),
                     axis=-1)
    return inter / (jnp.prod(wh1, -1)[..., :, None]
                    + jnp.prod(wh2, -1)[..., None, :] - inter + 1e-16)
