"""YOLO loss parity vs a torch oracle implementing the reference's
compute_loss/build_targets semantics (yolov3/utils/utils.py:366-485)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtdm_tpu.models.darknet import YoloHead
from rtdm_tpu.train.yolo_loss import YoloHyp, yolo_loss


def torch_oracle(p_list, anchors_list, targets, nc, img_size, hyp, gr=1.0):
    """targets: (T, 6) = [img_idx, cls, x, y, w, h] normalized (torch fork
    layout). p_list: torch layout (B, na, ny, nx, 5+nc)."""
    import torch

    def bce(x, t, pw, gamma, alpha):
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            x, t, pos_weight=torch.tensor(pw), reduction="none")
        if gamma > 0:
            p = torch.sigmoid(x)
            p_t = t * p + (1 - t) * (1 - p)
            af = t * alpha + (1 - t) * (1 - alpha)
            loss = loss * af * (1 - p_t) ** gamma
        return loss.mean()

    def bbox_giou(b1, b2):
        b1x1, b1x2 = b1[:, 0] - b1[:, 2] / 2, b1[:, 0] + b1[:, 2] / 2
        b1y1, b1y2 = b1[:, 1] - b1[:, 3] / 2, b1[:, 1] + b1[:, 3] / 2
        b2x1, b2x2 = b2[:, 0] - b2[:, 2] / 2, b2[:, 0] + b2[:, 2] / 2
        b2y1, b2y2 = b2[:, 1] - b2[:, 3] / 2, b2[:, 1] + b2[:, 3] / 2
        inter = (torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0) * \
                (torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)).clamp(0)
        union = (b1x2 - b1x1) * (b1y2 - b1y1) + \
                (b2x2 - b2x1) * (b2y2 - b2y1) - inter + 1e-9
        iou = inter / union
        cw = torch.max(b1x2, b2x2) - torch.min(b1x1, b2x1)
        ch = torch.max(b1y2, b2y2) - torch.min(b1y1, b2y1)
        c_area = cw * ch + 1e-9
        return iou - (c_area - union) / c_area

    lbox = torch.zeros(1)
    lobj = torch.zeros(1)
    lcls = torch.zeros(1)
    t = torch.from_numpy(targets)
    nt = len(t)
    for p, anchors in zip(p_list, anchors_list):
        p = torch.from_numpy(p)
        bs, na, ny, nx = p.shape[:4]
        stride = img_size / max(nx, ny)
        anchor_vec = torch.from_numpy(anchors / stride).float()
        ng = torch.tensor([nx, ny]).float()
        gwh_all = t[:, 4:6] * ng
        if nt:
            wh1, wh2 = anchor_vec[:, None], gwh_all[None]
            inter = torch.min(wh1, wh2).prod(2)
            iou = inter / (wh1.prod(2) + wh2.prod(2) - inter)
            a = torch.arange(na).view(-1, 1).repeat(1, nt).view(-1)
            tt = t.repeat(na, 1)
            gwh = gwh_all.repeat(na, 1)
            j = iou.view(-1) > hyp.iou_t
            tt, a, gwh = tt[j], a[j], gwh[j]
        else:
            tt, a, gwh = t, torch.zeros(0).long(), gwh_all
        b, c = tt[:, :2].long().t()
        gxy = tt[:, 2:4] * ng
        gi, gj = gxy.long().t()
        tobj = torch.zeros_like(p[..., 0])
        nb = len(b)
        if nb:
            ps = p[b, a, gj, gi]
            pxy = torch.sigmoid(ps[:, 0:2])
            pwh = torch.exp(ps[:, 2:4]).clamp(max=1e3) * anchor_vec[a]
            pbox = torch.cat((pxy, pwh), 1)
            tbox = torch.cat((gxy - gxy.floor(), gwh), 1)
            giou = bbox_giou(pbox.float(), tbox.float())
            lbox += (1.0 - giou).mean()
            tobj[b, a, gj, gi] = (1.0 - gr) + gr * giou.detach().clamp(0)
            if nc > 1:
                tcls_t = torch.zeros_like(ps[:, 5:])
                tcls_t[range(nb), c] = 1.0
                lcls += bce(ps[:, 5:], tcls_t, hyp.cls_pw, hyp.fl_gamma,
                            hyp.fl_alpha)
        lobj += bce(p[..., 4], tobj, hyp.obj_pw, hyp.fl_gamma, hyp.fl_alpha)
    return (float(lbox * hyp.giou), float(lobj * hyp.obj),
            float(lcls * hyp.cls))


@pytest.mark.parametrize("fl_gamma", [0.0, 1.5])
def test_yolo_loss_matches_torch_oracle(rng, fl_gamma):
    nc, na, img = 2, 3, 64
    anchors = np.array([[10, 13], [33, 23], [30, 61]], np.float32)
    heads = [YoloHead(anchors, nc, 0), YoloHead(anchors * 2, nc, 1)]
    grids = [(8, 8), (4, 4)]
    bsz, m = 2, 4
    hyp = YoloHyp(fl_gamma=fl_gamma)

    raw_maps, p_torch = [], []
    for (ny, nx) in grids:
        p = rng.normal(size=(bsz, na, ny, nx, 5 + nc)).astype(np.float32)
        p_torch.append(p)
        # to NHWC raw layout (B, ny, nx, na*no)
        raw_maps.append(jnp.asarray(
            np.transpose(p, (0, 2, 3, 1, 4)).reshape(bsz, ny, nx, -1)))

    # random labels, normalized torch layout
    tgt = []
    labels = np.zeros((bsz, m, 5), np.float32)
    nl = np.zeros((bsz,), np.int32)
    for b in range(bsz):
        k = int(rng.integers(1, m + 1))
        nl[b] = k
        for i in range(k):
            cx, cy = rng.uniform(0.1, 0.9, 2)
            w, h = rng.uniform(0.05, 0.4, 2)
            cls = int(rng.integers(0, nc))
            tgt.append([b, cls, cx, cy, w, h])
            labels[b, i] = [cls, cx * img, cy * img, w * img, h * img]
    targets = np.array(tgt, np.float32)

    want = torch_oracle(p_torch, [anchors, anchors * 2], targets, nc, img,
                        hyp)
    loss, comps = yolo_loss(raw_maps, heads, jnp.asarray(labels),
                            jnp.asarray(nl), img, hyp)
    got = (float(comps["box"]), float(comps["obj"]), float(comps["cls"]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(loss), sum(want), rtol=2e-4)


def test_yolo_loss_no_labels(rng):
    nc, na, img = 2, 2, 32
    anchors = np.array([[8, 8], [16, 16]], np.float32)
    heads = [YoloHead(anchors, nc, 0)]
    raw = jnp.asarray(rng.normal(size=(1, 4, 4, na * (5 + nc))),
                      jnp.float32)
    labels = jnp.zeros((1, 3, 5))
    loss, comps = yolo_loss([raw], heads, labels, jnp.zeros((1,), jnp.int32),
                            img)
    assert float(comps["box"]) == 0.0 and float(comps["cls"]) == 0.0
    assert float(comps["obj"]) > 0.0  # background obj loss still applies


def test_yolo_loss_is_differentiable(rng):
    import jax

    nc, na, img = 2, 2, 32
    anchors = np.array([[8, 8], [16, 16]], np.float32)
    heads = [YoloHead(anchors, nc, 0)]
    raw = jnp.asarray(rng.normal(size=(1, 4, 4, na * (5 + nc))), jnp.float32)
    labels = jnp.asarray([[[1, 16, 16, 8, 8], [0, 8, 8, 6, 6],
                           [0, 0, 0, 0, 0]]], jnp.float32)
    nl = jnp.asarray([2], jnp.int32)

    def f(r):
        return yolo_loss([r], heads, labels, nl, img)[0]

    g = jax.grad(f)(raw)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0
