"""Oracle tests: batched_nms vs an independent numpy re-implementation of
the reference's non_max_suppression filter chain (yolov3/utils/utils.py:
488-557 semantics: obj threshold, wh constraint, multi-label rows,
class-offset greedy NMS — torchvision.ops.nms's documented algorithm,
reimplemented here since torchvision is not installed)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtdm_tpu.ops.nms import batched_nms


def _greedy_nms_indices(boxes, scores, iou_thres):
    """torchvision.ops.nms semantics: descending-score greedy suppression
    of boxes with IoU > iou_thres against any kept box."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    areas = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * \
        np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:4], boxes[:, 2:4])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > iou_thres
    return np.array(keep, int)


def _xywh2xyxy(b):
    out = b.copy()
    out[:, 0] = b[:, 0] - b[:, 2] / 2
    out[:, 1] = b[:, 1] - b[:, 3] / 2
    out[:, 2] = b[:, 0] + b[:, 2] / 2
    out[:, 3] = b[:, 1] + b[:, 3] / 2
    return out


def torch_oracle(pred, conf_thres, iou_thres, multi_label):
    """Functional oracle for one image: (N, 5+nc) -> (M, 6) xyxy."""
    t = np.array(pred, np.float32)
    t = t[t[:, 4] > conf_thres]
    t = t[((t[:, 2:4] > 2) & (t[:, 2:4] < 4096)).all(1)]
    if not t.shape[0]:
        return np.zeros((0, 6), np.float32)
    nc = t.shape[1] - 5
    t[:, 5:] = t[:, 5:] * t[:, 4:5]
    box = _xywh2xyxy(t[:, :4])
    if multi_label and nc > 1:
        i, j = (t[:, 5:] > conf_thres).nonzero()
        rows = np.concatenate(
            [box[i], t[i, j + 5][:, None], j[:, None].astype(np.float32)], 1)
    else:
        j = t[:, 5:].argmax(1)
        conf = t[np.arange(len(t)), j + 5]
        rows = np.concatenate(
            [box, conf[:, None], j[:, None].astype(np.float32)], 1)
    if not rows.shape[0]:
        return np.zeros((0, 6), np.float32)
    offset_boxes = rows[:, :4] + rows[:, 5:6] * 4096.0
    keep = _greedy_nms_indices(offset_boxes, rows[:, 4], iou_thres)
    return rows[keep]


def _random_pred(rng, n=200, nc=3, img=416):
    pred = np.zeros((n, 5 + nc), np.float32)
    pred[:, 0:2] = rng.uniform(40, img - 40, (n, 2))
    pred[:, 2:4] = rng.uniform(0.5, 90, (n, 2))  # some w/h below min_wh=2
    pred[:, 4] = rng.uniform(0, 1, n)
    pred[:, 5:] = rng.uniform(0, 1, (n, nc))
    return pred


@pytest.mark.parametrize("multi_label", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_matches_torchvision(multi_label, seed):
    rng = np.random.default_rng(seed)
    pred = _random_pred(rng)
    want = torch_oracle(pred, 0.3, 0.5, multi_label)

    det, count = batched_nms(jnp.asarray(pred[None]), 0.3, 0.5,
                             max_det=300, top_k=pred.shape[0] * 3,
                             multi_label=multi_label)
    got = np.asarray(det)[0][: int(count[0])]

    assert got.shape[0] == want.shape[0]
    # both outputs are sorted by descending confidence; scores are distinct
    # with probability 1, so rows must align one-to-one
    np.testing.assert_allclose(got[:, 4], want[:, 4], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(got[:, 5].astype(int),
                                  want[:, 5].astype(int))


def test_wh_constraint_drops_degenerate_boxes():
    pred = np.zeros((1, 3, 7), np.float32)
    pred[0, 0] = [100, 100, 1.5, 40, 0.9, 0.9, 0.1]   # w < min_wh
    pred[0, 1] = [200, 200, 40, 5000, 0.9, 0.9, 0.1]  # h > max_wh
    pred[0, 2] = [300, 300, 40, 40, 0.9, 0.9, 0.1]    # fine
    det, count = batched_nms(jnp.asarray(pred), 0.1, 0.5, 8, 3)
    assert int(count[0]) == 1
    np.testing.assert_allclose(np.asarray(det)[0, 0, :4],
                               [280, 280, 320, 320], atol=1e-3)


def test_multi_label_emits_one_row_per_class():
    pred = np.zeros((1, 1, 7), np.float32)
    pred[0, 0] = [100, 100, 40, 40, 0.9, 0.8, 0.7]  # both classes above conf
    det, count = batched_nms(jnp.asarray(pred), 0.25, 0.5, 8, 4,
                             multi_label=True)
    assert int(count[0]) == 2
    cls = sorted(np.asarray(det)[0, :2, 5].astype(int))
    assert cls == [0, 1]
    det1, count1 = batched_nms(jnp.asarray(pred), 0.25, 0.5, 8, 4,
                               multi_label=False)
    assert int(count1[0]) == 1  # best-class-only keeps one row


def test_classes_filter_drops_unlisted_classes():
    """`classes` keeps only rows whose ASSIGNED class is listed
    (utils.py:536-537: the filter runs on the final class column). In
    best-class mode a box whose argmax class is unlisted is dropped
    entirely — it does NOT fall back to its runner-up class."""
    pred = np.zeros((1, 3, 8), np.float32)  # nc = 3
    pred[0, 0] = [100, 100, 40, 40, 0.9, 0.9, 0.1, 0.1]  # best cls 0
    pred[0, 1] = [200, 200, 40, 40, 0.9, 0.1, 0.9, 0.1]  # best cls 1
    pred[0, 2] = [300, 300, 40, 40, 0.9, 0.6, 0.5, 0.1]  # best cls 0,
    #                                     cls1 also above conf (multi)
    det, count = batched_nms(jnp.asarray(pred), 0.25, 0.5, 8, 4,
                             classes=(1,))
    assert int(count[0]) == 1  # only the best-cls-1 box survives
    assert int(np.asarray(det)[0, 0, 5]) == 1
    # multi-label: box 2's class-1 row passes the filter (obj*cls =
    # 0.45 > conf), so TWO class-1 rows come back
    det_m, count_m = batched_nms(jnp.asarray(pred), 0.25, 0.5, 8, 8,
                                 multi_label=True, classes=(1,))
    assert int(count_m[0]) == 2
    got = np.asarray(det_m)[0, :2]
    assert set(got[:, 5].astype(int)) == {1}
    # no filter: all three boxes, best-class rows
    _, count_all = batched_nms(jnp.asarray(pred), 0.25, 0.5, 8, 4)
    assert int(count_all[0]) == 3


def test_and_nms_requires_overlap():
    # 'and' (utils.py:591-597): head kept only when it overlaps another box
    # of its class; a lone far box of the same class is erased, but a class
    # with a single candidate skips NMS and survives (utils.py:570-572).
    pred = np.zeros((1, 4, 7), np.float32)
    pred[0, 0] = [100, 100, 40, 40, 0.9, 0.95, 0.0]  # cls0 head, overlapped
    pred[0, 1] = [104, 104, 40, 40, 0.8, 0.95, 0.0]  # cls0, suppressed
    pred[0, 2] = [300, 300, 40, 40, 0.7, 0.95, 0.0]  # cls0, far -> erased
    pred[0, 3] = [200, 200, 40, 40, 0.6, 0.0, 0.95]  # cls1 singleton -> kept
    det, count = batched_nms(jnp.asarray(pred), 0.1, 0.5, 8, 4,
                             method="and")
    assert int(count[0]) == 2
    d = np.asarray(det)[0][:2]
    assert set(d[:, 5].astype(int)) == {0, 1}
    np.testing.assert_allclose(sorted(d[:, 4]),
                               sorted([0.9 * 0.95, 0.6 * 0.95]), atol=1e-6)


def test_greedy_fixpoint_equals_sequential_on_chains():
    """The fixpoint formulation of _greedy_keep must equal the sequential
    greedy recurrence on adversarial suppression CHAINS (a suppresses b,
    so b can't suppress c, so c is kept and suppresses d, ...) where lazy
    approximations ('suppressed by any higher-scored box') diverge."""
    import jax.numpy as jnp
    from rtdm_tpu.ops.nms import _greedy_keep, box_iou_matrix

    rng = np.random.default_rng(7)
    for k, n_chains in ((32, 1), (64, 4), (128, 8)):
        # build chains: box i overlaps box i+1 heavily (iou > thr) but
        # overlaps i+2 barely (iou < thr) -> greedy keeps even positions
        boxes = []
        for c in range(n_chains):
            x0 = c * 1000.0
            for i in range(k // n_chains):
                boxes.append([x0 + 6.0 * i, 0.0, x0 + 6.0 * i + 10.0, 10.0])
        boxes = jnp.asarray(boxes, jnp.float32)
        iou = box_iou_matrix(boxes, boxes)
        valid = jnp.asarray(rng.random(k) > 0.2)

        got = np.asarray(_greedy_keep(iou, valid, 0.3))

        # independent sequential reference
        s = np.asarray(iou) > 0.3
        v = np.asarray(valid)
        want = np.zeros(k, bool)
        for i in range(k):
            want[i] = v[i] and not any(want[j] and s[j, i] for j in range(i))
        np.testing.assert_array_equal(got, want)
