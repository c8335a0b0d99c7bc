"""Detection mAP evaluation.

Re-implements the reference's metric pipeline:
- per-image greedy IoU matching of predictions to ground truth
  (yolov3/test.py:136-161: iterate unique classes, greedy best-IoU match,
  each target consumed once)
- ap_per_class + compute_ap (yolov3/utils/utils.py:145-233; 101-point
  interpolated AP) and the v5 variant over an IoU vector 0.5:0.95
  (yolov5/utils/metrics.py:18-106, continuous integration).

Host-side numpy: the per-image tensors are tiny (<=300 detections) and the
heavy lifting (forward + decode + NMS) already happened on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) xyxy IoU."""
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * \
        np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * \
        np.clip(b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def match_predictions(pred: np.ndarray, gt_boxes: np.ndarray,
                      gt_cls: np.ndarray,
                      iouv: np.ndarray) -> np.ndarray:
    """Greedy per-class matching. pred: (P,6) x1y1x2y2,conf,cls (sorted by
    conf desc). Returns tp: (P, len(iouv)) bool."""
    tp = np.zeros((len(pred), len(iouv)), bool)
    if len(pred) == 0 or len(gt_boxes) == 0:
        return tp
    for c in np.unique(gt_cls):
        ti = np.where(gt_cls == c)[0]
        pi = np.where(pred[:, 5] == c)[0]
        if len(pi) == 0:
            continue
        ious = box_iou_np(pred[pi, :4], gt_boxes[ti])  # (p, t)
        best_t = ious.argmax(1)
        best_iou = ious.max(1)
        used = set()
        for j in np.argsort(-pred[pi, 4]):
            if best_iou[j] >= iouv[0] and best_t[j] not in used:
                used.add(best_t[j])
                tp[pi[j]] = best_iou[j] >= iouv
                if len(used) == len(ti):
                    break
    return tp


def compute_ap(recall: Sequence[float], precision: Sequence[float],
               method: str = "interp101") -> float:
    """AP from raw PR points. 'interp101' = 101-point interpolation
    (utils.py:208-233's default); 'continuous' = exact area under the
    monotone envelope (v5 metrics.py behaviour)."""
    mrec = np.concatenate(([0.0], recall, [recall[-1] + 0.01]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    if method == "interp101":
        x = np.linspace(0, 1, 101)
        return float(np.trapezoid(np.interp(x, mrec, mpre), x))
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def ap_per_class(tp: np.ndarray, conf: np.ndarray, pred_cls: np.ndarray,
                 target_cls: np.ndarray, num_classes: int,
                 method: str = "interp101"
                 ) -> Dict[str, np.ndarray]:
    """Aggregate AP/P/R per class over the dataset.

    tp: (N, K) bool over K IoU thresholds; conf/pred_cls: (N,);
    target_cls: all ground-truth class ids concatenated.
    Returns dict with p, r, ap (C, K), f1 (C,), classes present.
    """
    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]
    k = tp.shape[1] if tp.ndim > 1 else 1
    classes = np.unique(target_cls).astype(int)
    p = np.zeros((num_classes, k))
    r = np.zeros((num_classes, k))
    ap = np.zeros((num_classes, k))
    for c in classes:
        mask = pred_cls == c
        n_gt = int((target_cls == c).sum())
        n_p = int(mask.sum())
        if n_p == 0 or n_gt == 0:
            continue
        fpc = np.cumsum(~tp[mask], axis=0)
        tpc = np.cumsum(tp[mask], axis=0)
        recall = tpc / (n_gt + 1e-16)
        precision = tpc / np.maximum(tpc + fpc, 1e-16)
        for ki in range(k):
            ap[c, ki] = compute_ap(recall[:, ki], precision[:, ki], method)
        # P/R reported at the max-F1 confidence of the 0.5-IoU column
        # (the reference reports final-point values; we use the same
        # convention as v5: value at best F1)
        f1c = 2 * precision[:, 0] * recall[:, 0] / \
            np.maximum(precision[:, 0] + recall[:, 0], 1e-16)
        best = int(np.argmax(f1c))
        p[c] = precision[best]
        r[c] = recall[best]
    f1 = 2 * p[:, 0] * r[:, 0] / np.maximum(p[:, 0] + r[:, 0], 1e-16)
    return {"p": p, "r": r, "ap": ap, "f1": f1, "classes": classes}


class DetectionConfusionMatrix:
    """IoU-matched detection confusion matrix (yolov5/utils/metrics.py:109):
    (nc+1)x(nc+1) where the extra row/col is background (FP/FN)."""

    def __init__(self, num_classes: int, conf: float = 0.25,
                 iou_thres: float = 0.45):
        self.nc = num_classes
        self.conf = conf
        self.iou_thres = iou_thres
        self.matrix = np.zeros((num_classes + 1, num_classes + 1), np.int64)

    def process_batch(self, det: np.ndarray, gt_boxes: np.ndarray,
                      gt_cls: np.ndarray) -> None:
        det = det[det[:, 4] > self.conf] if len(det) else det
        gt_cls = np.asarray(gt_cls, int)
        if len(gt_boxes) == 0:
            for c in (det[:, 5].astype(int) if len(det) else []):
                self.matrix[c, self.nc] += 1  # predicted, no gt -> FP col
            return
        if len(det) == 0:
            for c in gt_cls:
                self.matrix[self.nc, c] += 1  # gt, no pred -> FN row
            return
        iou = box_iou_np(gt_boxes, det[:, :4])
        matches = np.argwhere(iou > self.iou_thres)
        if len(matches):
            vals = iou[matches[:, 0], matches[:, 1]]
            order = np.argsort(-vals)
            matches = matches[order]
            # unique per detection then per gt (metrics.py:128-133)
            matches = matches[np.unique(matches[:, 1],
                                        return_index=True)[1]]
            matches = matches[np.unique(matches[:, 0],
                                        return_index=True)[1]]
        matched_gt = set(matches[:, 0]) if len(matches) else set()
        matched_det = set(matches[:, 1]) if len(matches) else set()
        for gi, di in matches:
            self.matrix[int(det[di, 5]), int(gt_cls[gi])] += 1
        for gi in range(len(gt_cls)):
            if gi not in matched_gt:
                self.matrix[self.nc, int(gt_cls[gi])] += 1
        for di in range(len(det)):
            if di not in matched_det:
                self.matrix[int(det[di, 5]), self.nc] += 1


def plot_pr_curve(tp: np.ndarray, conf: np.ndarray, pred_cls: np.ndarray,
                  target_cls: np.ndarray, num_classes: int, path: str,
                  names: Optional[Sequence[str]] = None) -> str:
    """Per-class PR curves at IoU 0.5 (metrics.py plot_pr_curve analogue)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    order = np.argsort(-conf)
    tp, pred_cls = tp[order], pred_cls[order]
    fig, ax = plt.subplots(figsize=(6, 5))
    for c in np.unique(target_cls).astype(int):
        mask = pred_cls == c
        n_gt = int((target_cls == c).sum())
        if not mask.any() or n_gt == 0:
            continue
        tpc = np.cumsum(tp[mask, 0])
        fpc = np.cumsum(~tp[mask, 0])
        recall = tpc / n_gt
        precision = tpc / np.maximum(tpc + fpc, 1e-16)
        label = names[c] if names and c < len(names) else f"class {c}"
        ax.plot(recall, precision, label=label)
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


class DetectionEvaluator:
    """Streaming accumulator: feed per-image (detections, ground truth),
    get mAP@0.5 / mAP@0.5:0.95 / P / R at the end."""

    def __init__(self, num_classes: int,
                 iouv: Optional[np.ndarray] = None,
                 method: str = "interp101"):
        self.num_classes = num_classes
        self.iouv = (iouv if iouv is not None
                     else np.linspace(0.5, 0.95, 10))
        self.method = method
        self._tp: List[np.ndarray] = []
        self._conf: List[np.ndarray] = []
        self._cls: List[np.ndarray] = []
        self._tcls: List[np.ndarray] = []

    def add_image(self, det: np.ndarray, gt_boxes: np.ndarray,
                  gt_cls: np.ndarray) -> None:
        """det: (P,6) x1y1x2y2,conf,cls; gt in the same coordinate frame."""
        self._tcls.append(np.asarray(gt_cls, np.int32))
        if len(det):
            self._tp.append(match_predictions(det, gt_boxes,
                                              np.asarray(gt_cls), self.iouv))
            self._conf.append(det[:, 4])
            self._cls.append(det[:, 5].astype(np.int32))

    def results(self) -> Dict[str, float]:
        tcls = (np.concatenate(self._tcls) if self._tcls
                else np.zeros(0, np.int32))
        if not self._tp:
            return {"mp": 0.0, "mr": 0.0, "map50": 0.0, "map": 0.0,
                    "per_class": None}
        stats = ap_per_class(np.concatenate(self._tp),
                             np.concatenate(self._conf),
                             np.concatenate(self._cls), tcls,
                             self.num_classes, self.method)
        present = stats["classes"]
        if len(present) == 0:
            return {"mp": 0.0, "mr": 0.0, "map50": 0.0, "map": 0.0,
                    "per_class": stats}
        return {
            "mp": float(stats["p"][present, 0].mean()),
            "mr": float(stats["r"][present, 0].mean()),
            "map50": float(stats["ap"][present, 0].mean()),
            "map": float(stats["ap"][present].mean()),
            "per_class": stats,
        }
