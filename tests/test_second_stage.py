"""apply_classifier parity: box squaring, crop-resize, and the veto.

Oracles are independent torch/numpy implementations of the reference's
apply_classifier semantics (yolov5/utils/general.py:apply_classifier);
no reference code is imported.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import linen as nn

from rtdm_tpu.export.second_stage import (SecondStageClassifier,
                                          crop_resize_bilinear,
                                          square_pad_boxes)


def torch_square_pad(xyxy: np.ndarray) -> np.ndarray:
    """The reference formula, verbatim semantics: xyxy2xywh ->
    wh = max(w,h) -> *1.3 + 30 -> xywh2xyxy -> .long()."""
    d = torch.tensor(xyxy, dtype=torch.float32)
    b = torch.zeros_like(d)
    b[:, 0] = (d[:, 0] + d[:, 2]) / 2
    b[:, 1] = (d[:, 1] + d[:, 3]) / 2
    b[:, 2] = d[:, 2] - d[:, 0]
    b[:, 3] = d[:, 3] - d[:, 1]
    b[:, 2:] = b[:, 2:].max(1)[0].unsqueeze(1)
    b[:, 2:] = b[:, 2:] * 1.3 + 30
    out = torch.zeros_like(b)
    out[:, 0] = b[:, 0] - b[:, 2] / 2
    out[:, 1] = b[:, 1] - b[:, 3] / 2
    out[:, 2] = b[:, 0] + b[:, 2] / 2
    out[:, 3] = b[:, 1] + b[:, 3] / 2
    return out.long().numpy()


def test_square_pad_boxes_oracle():
    rng = np.random.default_rng(0)
    x0y0 = rng.uniform(0, 300, (64, 2))
    wh = rng.uniform(1, 120, (64, 2))
    boxes = np.concatenate([x0y0, x0y0 + wh], 1).astype(np.float32)
    ours = np.asarray(square_pad_boxes(jnp.asarray(boxes)))
    ref = torch_square_pad(boxes)
    np.testing.assert_array_equal(ours, ref)


def test_crop_resize_matches_torch_bilinear():
    """cv2.resize INTER_LINEAR == torch interpolate(align_corners=False);
    our gather must match on interior boxes (no edge clamping active)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (96, 128, 3), np.uint8)
    boxes = np.array([[10, 20, 74, 52], [0, 0, 128, 96], [30, 5, 31, 6],
                      [100, 60, 128, 96]], np.int32)
    ours = np.asarray(crop_resize_bilinear(jnp.asarray(img),
                                           jnp.asarray(boxes), (32, 32)))
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        crop = torch.tensor(img[y0:y1, x0:x1].astype(np.float32)
                            ).permute(2, 0, 1)[None]
        ref = F.interpolate(crop, size=(32, 32), mode="bilinear",
                            align_corners=False)
        ref = ref[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours[i], ref, atol=1e-3)


def test_crop_resize_clamps_out_of_frame():
    img = np.full((40, 40, 3), 7, np.uint8)
    boxes = np.array([[-20, -20, 10, 10], [30, 30, 90, 90]], np.int32)
    out = np.asarray(crop_resize_bilinear(jnp.asarray(img),
                                          jnp.asarray(boxes), (8, 8)))
    assert np.all(out == 7.0)  # clamped crops sample only real pixels


class _ColorNet(nn.Module):
    """Deterministic 2-class stand-in for the second-stage net: class =
    red-vs-green dominance of the crop mean."""
    image_size: int = 16

    @nn.compact
    def __call__(self, x, train=False, apply_softmax=False):
        m = jnp.mean(x, axis=(1, 2))            # (B, 3)
        w = jnp.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
        return m @ w


@pytest.fixture(scope="module")
def frame_and_dets():
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :32, 0] = 200     # left half red  -> class 0
    img[:, 32:, 1] = 200     # right half green -> class 1
    det = np.zeros((1, 8, 6), np.float32)
    # (x1, y1, x2, y2, conf, cls); gain*side+30 padding stays in-half for
    # these small centered boxes after clamping
    det[0, 0] = [2, 24, 18, 40, 0.9, 0.0]      # red region, cls 0: keep
    det[0, 1] = [44, 24, 60, 40, 0.8, 1.0]     # green region, cls 1: keep
    det[0, 2] = [2, 2, 18, 18, 0.7, 1.0]       # red region, cls 1: DROP
    det[0, 3] = [44, 2, 60, 18, 0.6, 0.0]      # green region, cls 0: DROP
    return img, det, np.array([4], np.int32)


def test_second_stage_veto(frame_and_dets):
    img, det, count = frame_and_dets
    model = _ColorNet()
    stage = SecondStageClassifier(model, {"params": {}}, (64, 64),
                                  max_det=8, batch_size=1,
                                  normalize=False, quant="fp32")
    det2, count2 = stage(img[None], det, count)
    assert count2[0] == 2
    # stable compaction: survivors keep their relative order
    np.testing.assert_allclose(det2[0, 0], det[0, 0])
    np.testing.assert_allclose(det2[0, 1], det[0, 1])
    assert np.all(det2[0, 2:] == 0)  # dropped rows zeroed


def test_second_stage_class_map(frame_and_dets):
    img, det, count = frame_and_dets
    stage = SecondStageClassifier(_ColorNet(), {"params": {}}, (64, 64),
                                  max_det=8, batch_size=1,
                                  normalize=False, quant="fp32",
                                  class_map={0: 1, 1: 0})
    _, count2 = stage(img[None], det, count)
    assert count2[0] == 2  # the swapped map keeps exactly the other two


def test_second_stage_respects_count(frame_and_dets):
    img, det, count = frame_and_dets
    stage = SecondStageClassifier(_ColorNet(), {"params": {}}, (64, 64),
                                  max_det=8, batch_size=1,
                                  normalize=False, quant="fp32")
    _, count2 = stage(img[None], det, np.array([1], np.int32))
    assert count2[0] == 1  # rows beyond count never considered


def test_second_stage_class_map_identity_above_range(frame_and_dets):
    """Detector ids above the largest mapped key pass through as identity
    instead of being clamped through the LUT's last row."""
    img, det, count = frame_and_dets
    # map only class 0 -> 0 (identity); class 1 ids are ABOVE the lut
    # range and must still compare against classifier class 1
    stage = SecondStageClassifier(_ColorNet(), {"params": {}}, (64, 64),
                                  max_det=8, batch_size=1,
                                  normalize=False, quant="fp32",
                                  class_map={0: 0})
    det2, count2 = stage(img[None], det, count)
    # same outcome as no map at all: rows 0 (red/cls0) and 1 (green/cls1)
    assert count2[0] == 2
    np.testing.assert_allclose(det2[0, 0], det[0, 0])
    np.testing.assert_allclose(det2[0, 1], det[0, 1])
