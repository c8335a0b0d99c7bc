"""ops/boxes.bbox_iou vs a transcribed torch-functional oracle.

The GIoU path is already independently verified inside the v3 loss oracle
(tests/test_yolo_loss.py); this pins the whole family — plain/GIoU/DIoU/
CIoU, xywh and xyxy — against the reference formulas
(yolov5/utils/general.py:415-456; yolov3/utils/utils.py:237-283 differs
only in eps placement) on random aligned box pairs. Also covers
wh_iou_matrix (utils.py:310-315)."""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rtdm_tpu.ops.boxes import bbox_iou, wh_iou_matrix


def _oracle(b1, b2, xywh, mode):
    """Reference bbox_iou semantics (general.py:415-456), eps -> 0 since
    the random boxes are well-formed (w,h >= 1)."""
    b1 = torch.from_numpy(b1).double()
    b2 = torch.from_numpy(b2).double()
    if xywh:
        b1x1, b1x2 = b1[:, 0] - b1[:, 2] / 2, b1[:, 0] + b1[:, 2] / 2
        b1y1, b1y2 = b1[:, 1] - b1[:, 3] / 2, b1[:, 1] + b1[:, 3] / 2
        b2x1, b2x2 = b2[:, 0] - b2[:, 2] / 2, b2[:, 0] + b2[:, 2] / 2
        b2y1, b2y2 = b2[:, 1] - b2[:, 3] / 2, b2[:, 1] + b2[:, 3] / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = b1.T
        b2x1, b2y1, b2x2, b2y2 = b2.T
    inter = (torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0) * \
            (torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)).clamp(0)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / union
    if mode == "iou":
        return iou.numpy()
    cw = torch.max(b1x2, b2x2) - torch.min(b1x1, b2x1)
    ch = torch.max(b1y2, b2y2) - torch.min(b1y1, b2y1)
    if mode == "giou":
        c_area = cw * ch
        return (iou - (c_area - union) / c_area).numpy()
    c2 = cw ** 2 + ch ** 2
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    if mode == "diou":
        return (iou - rho2 / c2).numpy()
    v = (4 / math.pi ** 2) * (torch.atan(w2 / h2)
                              - torch.atan(w1 / h1)) ** 2
    alpha = v / (v - iou + 1.0)
    return (iou - (rho2 / c2 + v * alpha)).numpy()


def _random_pairs(rng, n, xywh):
    if xywh:
        xy = rng.uniform(5, 60, (n, 2))
        wh = rng.uniform(1, 30, (n, 2))
        return np.concatenate([xy, wh], 1).astype(np.float32)
    xy = rng.uniform(0, 50, (n, 2))
    wh = rng.uniform(1, 30, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


@pytest.mark.parametrize("xywh", [True, False])
@pytest.mark.parametrize("mode", ["iou", "giou", "diou", "ciou"])
def test_bbox_iou_family_matches_reference(xywh, mode):
    rng = np.random.default_rng(hash((xywh, mode)) % 2 ** 31)
    a = _random_pairs(rng, 64, xywh)
    # half the pairs heavily overlap (b = jittered a), half are independent
    b = _random_pairs(rng, 64, xywh)
    b[:32] = a[:32] + rng.normal(0, 2, (32, 4)).astype(np.float32)
    if not xywh:
        b[:, 2:] = np.maximum(b[:, 2:], b[:, :2] + 1.0)
    kw = {mode: True} if mode != "iou" else {}
    got = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b),
                              xywh=xywh, **kw))
    want = _oracle(a, b, xywh, mode)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_wh_iou_matrix_matches_reference():
    """wh_iou (utils.py:310-315): inter=min(w)*min(h) of co-centered boxes."""
    rng = np.random.default_rng(9)
    wh1 = rng.uniform(1, 50, (12, 2)).astype(np.float32)
    wh2 = rng.uniform(1, 50, (7, 2)).astype(np.float32)
    got = np.asarray(wh_iou_matrix(jnp.asarray(wh1), jnp.asarray(wh2)))
    t1, t2 = torch.from_numpy(wh1).double(), torch.from_numpy(wh2).double()
    inter = torch.min(t1[:, None], t2[None]).prod(2)
    want = inter / (t1.prod(1)[:, None] + t2.prod(1)[None] - inter)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)
    # batched leading dim broadcasts identically
    whb = np.stack([wh1, wh1[::-1]])
    gotb = np.asarray(wh_iou_matrix(jnp.asarray(whb), jnp.asarray(wh2)))
    np.testing.assert_allclose(gotb[0], got, rtol=1e-6)
