"""Randomized parity of the detection-metric stack against independently
transcribed reference oracles:

- greedy per-class matching  (yolov5/test.py:190-208, == yolov3/test.py:144-161)
- ap_per_class + compute_ap  (yolov5/utils/metrics.py:18-106 'v5' family;
                              yolov3/utils/utils.py:145-233 'v3' family)
- ConfusionMatrix.process_batch (yolov5/utils/metrics.py:117-156, incl. the
  no-match `if n:` guard quirk)

The oracles below are written from the reference's documented behavior, not
its code, and share nothing with rtdm_tpu.eval.map (own IoU, own loops) so a
transcription slip on one side shows up as a mismatch.
"""

import numpy as np
import pytest

from rtdm_tpu.eval.map import (DetectionConfusionMatrix, DetectionEvaluator,
                               ap_per_class, match_predictions)

IOUV = np.linspace(0.5, 0.95, 10)


# ---------------------------------------------------------------- oracles

def _iou_pairs(a, b):
    """(N,4) x (M,4) xyxy IoU — independent of eval.map.box_iou_np."""
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            ix1 = max(a[i, 0], b[j, 0])
            iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2])
            iy2 = min(a[i, 3], b[j, 3])
            inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
            ua = ((a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                  + (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1]) - inter)
            out[i, j] = inter / ua if ua > 0 else 0.0
    return out


def _oracle_match(pred, gt_boxes, gt_cls, iouv):
    """v5 test.py:190-208: per unique target class, each prediction row (in
    conf order) grabs its best-IoU target; a target is consumed once; the
    image stops early when every label (global count) is detected."""
    correct = np.zeros((len(pred), len(iouv)), bool)
    if len(pred) == 0 or len(gt_cls) == 0:
        return correct
    nl = len(gt_cls)
    detected = []
    for c in np.unique(gt_cls):
        ti = np.flatnonzero(np.asarray(gt_cls) == c)
        pi = np.flatnonzero(pred[:, 5] == c)
        if len(pi) == 0:
            continue
        ious = _iou_pairs(pred[pi, :4], gt_boxes[ti])
        best = ious.argmax(1)
        stop = False
        for j in range(len(pi)):
            if stop or ious[j, best[j]] <= iouv[0]:
                continue
            d = ti[best[j]]
            if d not in detected:
                detected.append(d)
                correct[pi[j]] = ious[j, best[j]] > iouv
                if len(detected) == nl:
                    stop = True
    return correct


def _oracle_ap(tp, conf, pred_cls, target_cls, family):
    """metrics.py:18-80 (v5) / utils.py:145-207 (v3): returns
    (p, r, ap, unique_classes) with rows per unique TARGET class."""
    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]
    uniq = np.unique(target_cls)
    k = tp.shape[1]
    ap = np.zeros((len(uniq), k))
    if family == "v5":
        px = np.linspace(0, 1, 1000)
        p = np.zeros((len(uniq), 1000))
        r = np.zeros((len(uniq), 1000))
    else:
        p = np.zeros((len(uniq), k))
        r = np.zeros((len(uniq), k))
    for ci, c in enumerate(uniq):
        sel = pred_cls == c
        n_gt = int((np.asarray(target_cls) == c).sum())
        if sel.sum() == 0 or n_gt == 0:
            continue
        tpc = tp[sel].cumsum(0)
        fpc = (1 - tp[sel]).cumsum(0)
        recall = tpc / (n_gt + 1e-16)
        precision = tpc / (tpc + fpc)
        if family == "v5":
            r[ci] = np.interp(-px, -conf[sel], recall[:, 0], left=0)
            p[ci] = np.interp(-px, -conf[sel], precision[:, 0], left=1)
        else:
            r[ci] = np.interp(-0.1, -conf[sel], recall[:, 0])
            p[ci] = np.interp(-0.1, -conf[sel], precision[:, 0])
        for j in range(k):
            if family == "v5":
                mrec = np.concatenate(([0.0], recall[:, j],
                                       [recall[-1, j] + 0.01]))
                mpre = np.concatenate(([1.0], precision[:, j], [0.0]))
            else:
                mrec = np.concatenate(([0.0], recall[:, j],
                                       [min(recall[-1, j] + 1e-3, 1.0)]))
                mpre = np.concatenate(([0.0], precision[:, j], [0.0]))
            mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
            x = np.linspace(0, 1, 101)
            ap[ci, j] = np.trapezoid(np.interp(x, mrec, mpre), x)
    if family == "v5":
        f1 = 2 * p * r / (p + r + 1e-16)
        i = f1.mean(0).argmax()
        p, r = p[:, i], r[:, i]
    else:
        p, r = p[:, 0], r[:, 0]
    return p, r, ap, uniq.astype(int)


def _oracle_confusion(nc, conf_thres, iou_thres, det, gt_boxes, gt_cls):
    """metrics.py:117-156 process_batch, including the no-match guard."""
    m = np.zeros((nc + 1, nc + 1), np.int64)
    det = det[det[:, 4] > conf_thres] if len(det) else det
    gt_cls = np.asarray(gt_cls, int)
    iou = (_iou_pairs(gt_boxes, det[:, :4])
           if len(gt_boxes) and len(det) else np.zeros((len(gt_boxes),
                                                        len(det))))
    gi, di = np.nonzero(iou > iou_thres)
    if len(gi):
        trip = np.stack([gi.astype(float), di.astype(float),
                         iou[gi, di]], 1)
        if len(gi) > 1:
            trip = trip[trip[:, 2].argsort()[::-1]]
            trip = trip[np.unique(trip[:, 1], return_index=True)[1]]
            trip = trip[trip[:, 2].argsort()[::-1]]
            trip = trip[np.unique(trip[:, 0], return_index=True)[1]]
    else:
        trip = np.zeros((0, 3))
    n = len(trip) > 0
    m0 = trip[:, 0].astype(int)
    m1 = trip[:, 1].astype(int)
    for i, gc in enumerate(gt_cls):
        j = m0 == i
        if n and j.sum() == 1:
            m[int(det[m1[j][0], 5]), gc] += 1
        else:
            m[nc, gc] += 1
    if n:
        for i in range(len(det)):
            if not (m1 == i).any():
                m[int(det[i, 5]), nc] += 1
    return m


# ----------------------------------------------------------- random images

def _random_image(rng, nc, max_pred=30, max_gt=10):
    def boxes(n):
        xy = rng.uniform(0, 360, (n, 2))
        wh = rng.uniform(5, 60, (n, 2))
        return np.concatenate([xy, xy + wh], 1)

    n_p = int(rng.integers(0, max_pred + 1))
    n_g = int(rng.integers(0, max_gt + 1))
    conf = np.sort(rng.uniform(0.05, 1.0, n_p))[::-1]  # NMS emits desc
    det = np.concatenate([boxes(n_p), conf[:, None],
                          rng.integers(0, nc, (n_p, 1)).astype(float)], 1)
    # bias half the predictions onto jittered copies of gt boxes so real
    # matches exist at varied IoU levels
    gt = boxes(n_g)
    gt_cls = rng.integers(0, nc, n_g)
    for i in range(min(n_p // 2, n_g)):
        det[i, :4] = gt[i] + rng.normal(0, 4, 4)
        det[i, 5] = gt_cls[i] if rng.random() < 0.8 else det[i, 5]
    return det, gt, gt_cls


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_match_predictions_fuzz_parity(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        det, gt, gt_cls = _random_image(rng, nc=3)
        got = match_predictions(det, gt, gt_cls, IOUV)
        want = _oracle_match(det, gt, gt_cls, IOUV)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("family", ["v5", "v3"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_per_class_fuzz_parity(family, seed):
    rng = np.random.default_rng(100 + seed)
    nc = 3
    tps, confs, pcls, tcls = [], [], [], []
    for _ in range(6):
        det, gt, gt_cls = _random_image(rng, nc)
        tps.append(_oracle_match(det, gt, gt_cls, IOUV))
        confs.append(det[:, 4])
        pcls.append(det[:, 5].astype(int))
        tcls.append(gt_cls)
    tp = np.concatenate(tps)
    conf = np.concatenate(confs)
    pred_cls = np.concatenate(pcls)
    target_cls = np.concatenate(tcls)

    stats = ap_per_class(tp, conf, pred_cls, target_cls, nc, family=family)
    p_o, r_o, ap_o, uniq = _oracle_ap(tp, conf, pred_cls, target_cls, family)
    for ci, c in enumerate(uniq):
        np.testing.assert_allclose(stats["ap"][c], ap_o[ci], atol=1e-12)
        np.testing.assert_allclose(stats["p"][c, 0], p_o[ci], atol=1e-12)
        np.testing.assert_allclose(stats["r"][c, 0], r_o[ci], atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_confusion_matrix_fuzz_parity(seed):
    rng = np.random.default_rng(200 + seed)
    nc = 3
    cm = DetectionConfusionMatrix(nc, conf=0.25, iou_thres=0.45)
    want = np.zeros((nc + 1, nc + 1), np.int64)
    for _ in range(10):
        det, gt, gt_cls = _random_image(rng, nc)
        cm.process_batch(det, gt, gt_cls)
        want += _oracle_confusion(nc, 0.25, 0.45, det, gt, gt_cls)
    np.testing.assert_array_equal(cm.matrix, want)


def test_evaluator_end_to_end_fuzz_parity():
    """DetectionEvaluator (streaming) == oracle pipeline on map50/map."""
    rng = np.random.default_rng(42)
    nc = 2
    ev = DetectionEvaluator(nc)
    tps, confs, pcls, tcls = [], [], [], []
    for _ in range(8):
        det, gt, gt_cls = _random_image(rng, nc)
        ev.add_image(det, gt, gt_cls)
        if len(det):
            tps.append(_oracle_match(det, gt, gt_cls, IOUV))
            confs.append(det[:, 4])
            pcls.append(det[:, 5].astype(int))
        tcls.append(gt_cls)
    res = ev.results()
    _, _, ap_o, uniq = _oracle_ap(
        np.concatenate(tps), np.concatenate(confs), np.concatenate(pcls),
        np.concatenate(tcls), "v5")
    np.testing.assert_allclose(res["map50"], ap_o[:, 0].mean(), atol=1e-12)
    np.testing.assert_allclose(res["map"], ap_o.mean(), atol=1e-12)
