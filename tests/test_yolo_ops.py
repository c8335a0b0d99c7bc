"""YOLO decode + NMS op tests vs independent torch/numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtdm_tpu.ops.nms import batched_nms, box_iou_matrix, scale_coords, xywh_to_xyxy
from rtdm_tpu.ops.yolo import decode_head, raw_to_train_layout


def torch_decode_oracle(p_nchw, anchors_px, img_size, nc):
    """YOLOLayer inference decode (yolov3/models.py:252-257) in torch."""
    import torch
    na = anchors_px.shape[0]
    no = nc + 5
    bs, _, ny, nx = p_nchw.shape
    stride = img_size / max(nx, ny)
    p = torch.from_numpy(p_nchw).view(bs, na, no, ny, nx) \
        .permute(0, 1, 3, 4, 2).contiguous()
    yv, xv = torch.meshgrid(torch.arange(ny), torch.arange(nx),
                            indexing="ij")
    grid = torch.stack((xv, yv), 2).float().view(1, 1, ny, nx, 2)
    anchor_wh = torch.from_numpy(anchors_px / stride).view(1, na, 1, 1, 2)
    io = p.clone()
    io[..., :2] = torch.sigmoid(io[..., :2]) + grid
    io[..., 2:4] = torch.exp(io[..., 2:4]) * anchor_wh
    io[..., :4] *= stride
    torch.sigmoid_(io[..., 4:])
    return io.view(bs, -1, no).numpy()


def test_decode_matches_torch_oracle(rng):
    nc, na, ny, nx, img = 2, 3, 13, 13, 416
    anchors = np.array([[10, 14], [23, 27], [37, 58]], np.float32)
    p_nchw = rng.normal(size=(2, na * (nc + 5), ny, nx)).astype(np.float32)
    want = torch_decode_oracle(p_nchw, anchors, img, nc)
    p_nhwc = np.transpose(p_nchw, (0, 2, 3, 1))
    got = decode_head(jnp.asarray(p_nhwc), jnp.asarray(anchors), img, nc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_decode_scale_xy_and_new_coords(rng):
    nc, na = 2, 2
    anchors = np.array([[10, 14], [23, 27]], np.float32)
    p = rng.normal(size=(1, 8, 8, na * (nc + 5))).astype(np.float32)
    # scale_x_y widens xy range: centers can exceed the classic [0,1)+grid
    d1 = np.asarray(decode_head(jnp.asarray(p), anchors, 256, nc,
                                scale_x_y=1.2))
    d0 = np.asarray(decode_head(jnp.asarray(p), anchors, 256, nc))
    assert not np.allclose(d1[..., :2], d0[..., :2])
    np.testing.assert_allclose(d1[..., 4:], d0[..., 4:], rtol=1e-6)
    # new_coords: wh = (2t)^2 * anchor, no sigmoid on obj/cls
    dn = np.asarray(decode_head(jnp.asarray(p), anchors, 256, nc,
                                new_coords=True))
    raw = p.reshape(1, 8, 8, na, nc + 5)
    want_wh = np.square(raw[..., 2:4] * 2) * anchors[None, None, None]
    got_wh = dn.reshape(1, na, 8, 8, nc + 5)[..., 2:4]
    np.testing.assert_allclose(got_wh,
                               np.transpose(want_wh, (0, 3, 1, 2, 4)),
                               rtol=1e-5)


def test_decode_rect_input_per_axis_strides(rng):
    """Rect-batch decode: (h, w) target uses stride_x = w/nx and
    stride_y = h/ny independently (yolo_layer.cu derives the scales from
    input w/h separately), and the square spelling is unchanged."""
    nc, na, ny, nx = 2, 2, 6, 8
    h, w = 192, 256
    anchors = np.array([[10, 14], [23, 27]], np.float32)
    p = rng.normal(size=(1, ny, nx, na * (nc + 5))).astype(np.float32)
    got = np.asarray(decode_head(jnp.asarray(p), anchors, (h, w), nc))
    raw = p.reshape(1, ny, nx, na, nc + 5)
    sig = 1.0 / (1.0 + np.exp(-raw))
    gx, gy = np.meshgrid(np.arange(nx, dtype=np.float32),
                         np.arange(ny, dtype=np.float32))
    want_x = (sig[..., 0] + gx[None, :, :, None]) * (w / nx)
    want_y = (sig[..., 1] + gy[None, :, :, None]) * (h / ny)
    want_wh = np.exp(raw[..., 2:4]) * anchors[None, None, None]
    got5 = got.reshape(1, na, ny, nx, nc + 5)
    np.testing.assert_allclose(
        got5[..., 0], np.transpose(want_x, (0, 3, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(
        got5[..., 1], np.transpose(want_y, (0, 3, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(
        got5[..., 2:4],
        np.transpose(want_wh, (0, 3, 1, 2, 4)), rtol=1e-5)
    # square target: tuple and int spellings are identical
    ps = rng.normal(size=(1, 5, 5, na * (nc + 5))).astype(np.float32)
    a = np.asarray(decode_head(jnp.asarray(ps), anchors, 160, nc))
    b = np.asarray(decode_head(jnp.asarray(ps), anchors, (160, 160), nc))
    np.testing.assert_array_equal(a, b)


def test_train_layout():
    p = np.arange(2 * 4 * 4 * 14, dtype=np.float32).reshape(2, 4, 4, 14)
    out = np.asarray(raw_to_train_layout(jnp.asarray(p), 2, 2))
    assert out.shape == (2, 2, 4, 4, 7)
    np.testing.assert_array_equal(out[0, 1, 2, 3], p[0, 2, 3, 7:14])


# ---------------------------------------------------------------------------
# NMS


def numpy_greedy_nms(boxes, scores, iou_thres):
    """Reference greedy NMS (the trt runtime's _nms_boxes semantics)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        ious = np.asarray(box_iou_matrix(
            jnp.asarray(boxes[i][None]), jnp.asarray(boxes[rest])))[0]
        order = rest[ious <= iou_thres]
    return keep


def test_nms_matches_numpy_greedy(rng):
    n, nc = 64, 2
    pred = np.zeros((1, n, 5 + nc), np.float32)
    pred[0, :, 0:2] = rng.uniform(50, 350, (n, 2))
    pred[0, :, 2:4] = rng.uniform(20, 80, (n, 2))
    pred[0, :, 4] = rng.uniform(0.2, 1.0, n)
    cls = rng.integers(0, nc, n)
    pred[0, np.arange(n), 5 + cls] = rng.uniform(0.5, 1.0, n)

    det, count = batched_nms(jnp.asarray(pred), conf_thres=0.1,
                             iou_thres=0.5, max_det=64, top_k=64)
    det, count = np.asarray(det)[0], int(count[0])

    # oracle: per-class greedy on obj*cls scores
    boxes = np.asarray(xywh_to_xyxy(jnp.asarray(pred[0, :, :4])))
    scores = pred[0, :, 5:] * pred[0, :, 4:5]
    best = scores.max(1)
    bcls = scores.argmax(1)
    want = []
    for c in range(nc):
        m = (bcls == c) & (best > 0.1)
        idxs = np.where(m)[0]
        if idxs.size:
            for k in numpy_greedy_nms(boxes[idxs], best[idxs], 0.5):
                want.append((idxs[k], c))
    want_set = {(round(float(boxes[i][0]), 3), c, round(float(best[i]), 5))
                for i, c in want}
    got_set = {(round(float(d[0]), 3), int(d[5]), round(float(d[4]), 5))
               for d in det[:count]}
    assert got_set == want_set


def test_nms_fixed_shapes_and_padding():
    pred = np.zeros((2, 16, 7), np.float32)  # all below threshold
    det, count = batched_nms(jnp.asarray(pred), conf_thres=0.3,
                             max_det=8, top_k=16)
    assert det.shape == (2, 8, 6)
    assert np.all(np.asarray(count) == 0)
    assert np.all(np.asarray(det) == 0)


def test_nms_class_offset_keeps_overlapping_different_classes():
    pred = np.zeros((1, 2, 7), np.float32)
    for i, c in enumerate([0, 1]):
        pred[0, i, :4] = [100, 100, 40, 40]  # identical boxes
        pred[0, i, 4] = 0.9
        pred[0, i, 5 + c] = 0.9
    det, count = batched_nms(jnp.asarray(pred), conf_thres=0.1,
                             iou_thres=0.5, max_det=4, top_k=2)
    assert int(count[0]) == 2  # different classes both survive
    det_a, _ = batched_nms(jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5,
                           max_det=4, top_k=2, class_agnostic=True)
    # class-agnostic collapses them — recompute count from rows
    assert int((np.asarray(det_a)[0, :, 4] > 0).sum()) == 1


def test_scale_coords_letterbox():
    det = jnp.asarray(np.array([[[16., 100., 116., 200., 0.9, 0.]]],
                               np.float32))
    # 416x416 model input, original 640x480 (landscape): gain=0.65,
    # pad_w=0, pad_h=(416-312)/2=52
    out = np.asarray(scale_coords(det, (416, 416), (480, 640)))
    np.testing.assert_allclose(out[0, 0, :4],
                               [16 / 0.65, 48 / 0.65, 116 / 0.65, 148 / 0.65],
                               rtol=1e-5)


def test_scale_coords_ratio_pad_roundtrip():
    """When the applied letterbox gain was capped (no-upscale eval), a
    recomputed fit is wrong; ratio_pad (general.py:391-404 semantics)
    must recover original coordinates exactly."""
    from rtdm_tpu.data.odder import letterbox_image
    oh, ow = 200, 300  # smaller than the 416 square: cap=1 binds
    img = np.zeros((oh, ow, 3), np.uint8)
    _, gain, (pad_w, pad_h) = letterbox_image(img, 416, gain_cap=1.0)
    assert gain == 1.0 and (pad_w, pad_h) == (58.0, 108.0)
    # a GT box at original pixels (50, 40, 250, 160), letterboxed forward
    fwd = np.array([50 * gain + pad_w, 40 * gain + pad_h,
                    250 * gain + pad_w, 160 * gain + pad_h])
    det = jnp.asarray(np.array([[[*fwd, 0.9, 0.]]], np.float32))
    # without ratio_pad the recomputed gain (416/300) mis-scales...
    wrong = np.asarray(scale_coords(det, (416, 416), (oh, ow)))[0, 0, :4]
    assert abs(wrong[0] - 50) > 5
    # ...with ratio_pad the round-trip is exact
    out = np.asarray(scale_coords(det, (416, 416), (oh, ow),
                                  ratio_pad=(gain, (pad_w, pad_h))))
    np.testing.assert_allclose(out[0, 0, :4], [50, 40, 250, 160],
                               rtol=1e-5)


def test_minimal_rect_shape_long_axis_never_overshoots():
    """Integer-exact minimal_rect_shape: the long-side target equals
    img_size for every frame size when img_size is a stride multiple
    (float rounding used to bump e.g. 1050x525@320 to a 352 long side)."""
    from rtdm_tpu.data.odder import minimal_rect_shape
    assert minimal_rect_shape(525, 1050, 320) == (160, 320)
    rng = np.random.default_rng(0)
    for _ in range(500):
        h = int(rng.integers(16, 4000))
        w = int(rng.integers(16, 4000))
        s = int(rng.integers(5, 40)) * 32
        th, tw = minimal_rect_shape(h, w, s)
        assert max(th, tw) == s, (h, w, s, th, tw)
        assert th % 32 == 0 and tw % 32 == 0
        # targets still fit the aspect-preserved resize
        g = s / max(h, w)
        assert th >= int(np.floor(h * g)) and tw >= int(np.floor(w * g))
