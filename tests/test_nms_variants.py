"""merge/soft NMS variants, detection confusion matrix, conv+bn folding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.eval.map import DetectionConfusionMatrix
from rtdm_tpu.ops.fuse import fuse_conv_bn
from rtdm_tpu.ops.nms import batched_nms


def _two_overlapping_one_far():
    pred = np.zeros((1, 3, 7), np.float32)
    pred[0, 0] = [100, 100, 40, 40, 0.9, 0, 0]
    pred[0, 1] = [104, 104, 40, 40, 0.8, 0, 0]   # iou ~0.68 with box 0
    pred[0, 2] = [300, 300, 40, 40, 0.7, 0, 0]
    pred[0, :, 5] = 0.9  # class 0 prob
    return pred


def test_merge_nms_weighted_average():
    pred = _two_overlapping_one_far()
    det_g, cnt_g = batched_nms(jnp.asarray(pred), 0.1, 0.5, 8, 3)
    det_m, cnt_m = batched_nms(jnp.asarray(pred), 0.1, 0.5, 8, 3,
                               method="merge")
    assert int(cnt_g[0]) == int(cnt_m[0]) == 2
    g, m = np.asarray(det_g)[0], np.asarray(det_m)[0]
    # greedy keeps box 0 untouched; merge shifts it toward box 1
    s0, s1 = 0.9 * 0.9, 0.8 * 0.9
    want_x1 = (80 * s0 + 84 * s1) / (s0 + s1)
    np.testing.assert_allclose(g[0, 0], 80.0, atol=1e-3)
    np.testing.assert_allclose(m[0, 0], want_x1, atol=1e-2)
    # the far box is identical in both
    np.testing.assert_allclose(g[1], m[1], atol=1e-4)


def test_soft_nms_decays_not_kills():
    pred = _two_overlapping_one_far()
    det, _ = batched_nms(jnp.asarray(pred), 0.05, 0.5, 8, 3, method="soft")
    d = np.asarray(det)[0]
    scores = d[d[:, 4] > 0, 4]
    # all three boxes survive; the overlapped one has a decayed score
    assert len(scores) == 3
    assert scores.max() <= 0.9 * 0.9 + 1e-6
    assert np.any(scores < 0.8 * 0.9 - 0.05)


def test_confusion_matrix_detection():
    cm = DetectionConfusionMatrix(2, conf=0.25, iou_thres=0.45)
    gt = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    gt_cls = np.array([0, 1])
    det = np.array([
        [0, 0, 10, 10, 0.9, 0],      # TP class 0
        [50, 50, 60, 60, 0.9, 0],    # wrong class (pred 0, gt 1)
        [200, 200, 210, 210, 0.9, 1],  # FP background
    ])
    cm.process_batch(det, gt, gt_cls)
    assert cm.matrix[0, 0] == 1          # correct
    assert cm.matrix[0, 1] == 1          # class confusion
    assert cm.matrix[1, 2] == 1          # FP (pred 1 vs background)
    # no unmatched gt
    assert cm.matrix[2].sum() == 0


def test_confusion_matrix_misses():
    cm = DetectionConfusionMatrix(2)
    cm.process_batch(np.zeros((0, 6)), np.array([[0, 0, 10, 10]], float),
                     np.array([1]))
    assert cm.matrix[2, 1] == 1  # FN


def test_fuse_conv_bn_matches_separate(rng):
    from rtdm_tpu.ops.convpool import conv2d

    k = jnp.asarray(rng.normal(size=(3, 3, 4, 8)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 4)), jnp.float32)
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32) * 0.1
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    eps = 1e-4

    y = conv2d(x, k, padding=1)
    want = (np.asarray(y) - mean) / np.sqrt(var + eps) * gamma + beta

    fk, fb = fuse_conv_bn(np.asarray(k), None, gamma, beta, mean, var, eps)
    got = conv2d(x, jnp.asarray(fk), jnp.asarray(fb), padding=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
