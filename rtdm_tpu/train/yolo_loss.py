"""YOLO training loss — fixed-shape TPU re-design of the v3-fork loss.

Reference semantics (yolov3/utils/utils.py:366-485):
- build_targets: every (label, anchor) pair is a candidate ("use_all
  anchors"), rejected when wh-IoU(anchor, label) <= iou_t (hyp 0.3).
- box loss: mean(1 - GIoU(pred, target)) over accepted candidates, with
  pxy = sigmoid, pwh = exp(clamped 1e3) * anchor (grid units).
- obj loss: BCE-with-logits over EVERY grid cell against tobj, where
  matched cells get (1-gr) + gr*clip(giou,0) (giou-ratio targets, :406).
- cls loss: BCE-with-logits one-hot (smooth_BCE eps=0 -> cp=1, cn=0),
  only when nc > 1.
- optional TF-style focal wrapper (alpha 0.25, gamma hyp fl_gamma) on
  obj+cls BCEs (utils.py:318-345).
- gains: lbox*giou, lobj*obj, lcls*cls (hyp, train.py:27-44).

TPU design: instead of the torch version's variable-length index lists,
every (image, label-slot, anchor) triple is a fixed-size candidate with a
validity mask; gathers/scatters are dense and the whole loss jits into the
training step. tobj scatter uses .at[].max — deterministic under the rare
duplicate-cell collisions (torch's last-write-wins is order-dependent).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from rtdm_tpu.ops.boxes import bbox_iou, wh_iou_matrix
from rtdm_tpu.ops.yolo import raw_to_train_layout


@dataclasses.dataclass(frozen=True)
class YoloHyp:
    """Loss hyperparameters (defaults = yolov3/train.py:27-44)."""
    giou: float = 1.0
    cls: float = 37.4
    cls_pw: float = 1.0
    obj: float = 64.3
    obj_pw: float = 1.0
    iou_t: float = 0.3
    fl_gamma: float = 1.5
    fl_alpha: float = 0.25
    gr: float = 1.0           # giou-ratio for obj targets (train.py:226)
    label_smoothing: float = 0.0


def _bce_logits(x, t, pos_weight=1.0):
    """Elementwise BCEWithLogits with pos_weight (log-space stable)."""
    log_p = -jax.nn.softplus(-x)      # log sigmoid(x)
    log_np = -jax.nn.softplus(x)      # log (1 - sigmoid(x))
    return -(pos_weight * t * log_p + (1.0 - t) * log_np)


def _focal(bce, x, t, gamma, alpha):
    """TF-style focal modulation of an elementwise BCE (utils.py:330-341)."""
    p = jax.nn.sigmoid(x)
    p_t = t * p + (1 - t) * (1 - p)
    alpha_f = t * alpha + (1 - t) * (1 - alpha)
    return bce * alpha_f * jnp.power(1.0 - p_t, gamma)


def _masked_mean(x, mask, eps=1e-9):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), eps)


def yolo_loss(raw_maps: Sequence[jax.Array], heads,
              labels: jax.Array, num_labels: jax.Array,
              img_size: int, hyp: YoloHyp = YoloHyp()
              ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Compute the total detection loss.

    raw_maps: per-head NHWC maps (B, ny, nx, na*(5+nc)).
    labels: (B, M, 5) = class, cx, cy, w, h in LETTERBOXED PIXELS
    (data/odder.py layout); num_labels: (B,).
    """
    nc = heads[0].num_classes
    total_box = jnp.zeros(())
    total_obj = jnp.zeros(())
    total_cls = jnp.zeros(())

    bsz, m = labels.shape[0], labels.shape[1]
    slot_valid = (jax.lax.broadcasted_iota(jnp.int32, (bsz, m), 1)
                  < num_labels[:, None])

    for raw, head in zip(raw_maps, heads):
        p = raw_to_train_layout(raw, head.na, nc).astype(jnp.float32)
        _, na, ny, nx, _ = p.shape
        stride = img_size / max(nx, ny)
        anchor_vec = jnp.asarray(head.anchors_px, jnp.float32) / stride

        # targets in grid units
        gxy = labels[..., 1:3] / stride           # (B, M, 2)
        gwh = labels[..., 3:5] / stride

        # candidate validity: real label slot AND anchor wh-iou > iou_t
        wh_iou = wh_iou_matrix(gwh, anchor_vec)   # (B, M, na)
        valid = slot_valid[:, :, None] & (wh_iou > hyp.iou_t)

        gi = jnp.clip(jnp.floor(gxy[..., 0]), 0, nx - 1).astype(jnp.int32)
        gj = jnp.clip(jnp.floor(gxy[..., 1]), 0, ny - 1).astype(jnp.int32)

        # flatten (B, M, na) candidates
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (bsz, m, na), 0).ravel()
        a_idx = jax.lax.broadcasted_iota(jnp.int32, (bsz, m, na), 2).ravel()
        gi_f = jnp.broadcast_to(gi[:, :, None], (bsz, m, na)).ravel()
        gj_f = jnp.broadcast_to(gj[:, :, None], (bsz, m, na)).ravel()
        vmask = valid.ravel()
        tcls = jnp.broadcast_to(labels[..., 0].astype(jnp.int32)[:, :, None],
                                (bsz, m, na)).ravel()
        # offset relative to the CLIPPED cell (gi/gj above) so a center at
        # the grid edge trains toward its assigned cell, not one past it
        cell = jnp.stack([gi, gj], axis=-1).astype(jnp.float32)
        txy = jnp.broadcast_to((gxy - cell)[:, :, None, :],
                               (bsz, m, na, 2)).reshape(-1, 2)
        twh = jnp.broadcast_to(gwh[:, :, None, :],
                               (bsz, m, na, 2)).reshape(-1, 2)
        avec = jnp.broadcast_to(anchor_vec[None, None],
                                (bsz, m, na, 2)).reshape(-1, 2)

        ps = p[b_idx, a_idx, gj_f, gi_f]          # (C, 5+nc)
        pxy = jax.nn.sigmoid(ps[:, 0:2])
        pwh = jnp.clip(jnp.exp(ps[:, 2:4]), None, 1e3) * avec
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        tbox = jnp.concatenate([txy, twh], axis=-1)
        giou = bbox_iou(pbox, tbox, xywh=True, giou=True)
        total_box = total_box + _masked_mean(1.0 - giou, vmask)

        # obj targets: scatter-max of the giou ratio
        tobj = jnp.zeros((bsz, na, ny, nx), jnp.float32)
        val = jnp.where(
            vmask,
            (1.0 - hyp.gr)
            + hyp.gr * jnp.clip(jax.lax.stop_gradient(giou), 0.0),
            0.0)
        tobj = tobj.at[b_idx, a_idx, gj_f, gi_f].max(val)
        obj_bce = _bce_logits(p[..., 4], tobj, hyp.obj_pw)
        if hyp.fl_gamma > 0:
            obj_bce = _focal(obj_bce, p[..., 4], tobj, hyp.fl_gamma,
                             hyp.fl_alpha)
        total_obj = total_obj + jnp.mean(obj_bce)

        if nc > 1:
            cp = 1.0 - 0.5 * hyp.label_smoothing
            cn = 0.5 * hyp.label_smoothing
            t_one = jnp.where(
                jax.nn.one_hot(tcls, nc, dtype=jnp.float32) > 0, cp, cn)
            cls_bce = _bce_logits(ps[:, 5:], t_one, hyp.cls_pw)
            if hyp.fl_gamma > 0:
                cls_bce = _focal(cls_bce, ps[:, 5:], t_one, hyp.fl_gamma,
                                 hyp.fl_alpha)
            total_cls = total_cls + _masked_mean(
                jnp.mean(cls_bce, axis=-1), vmask)

    lbox = total_box * hyp.giou
    lobj = total_obj * hyp.obj
    lcls = total_cls * hyp.cls
    loss = lbox + lobj + lcls
    return loss, {"box": lbox, "obj": lobj, "cls": lcls, "total": loss}


# ---------------------------------------------------------------------------
# v5 variant


@dataclasses.dataclass(frozen=True)
class YoloHypV5:
    """v5 loss hyperparameters (defaults = yolov5/data/hyp.scratch.yaml)."""
    box: float = 0.05
    cls: float = 0.5
    cls_pw: float = 1.0
    obj: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    fl_alpha: float = 0.25
    gr: float = 1.0
    label_smoothing: float = 0.0


def scale_v5_gains(hyp: "YoloHypV5", nl: int, nc: int,
                   img_size: int) -> "YoloHypV5":
    """Mandatory v5 gain scaling (yolov5/train.py:225-227): the
    hyp.scratch box/cls/obj values assume nl=3 detect layers, nc=80
    classes and 640px input; real runs rescale box to layers, cls to
    classes+layers, obj to image-size+layers."""
    return dataclasses.replace(
        hyp,
        box=hyp.box * 3.0 / nl,
        cls=hyp.cls * nc / 80.0 * 3.0 / nl,
        obj=hyp.obj * (img_size / 640.0) ** 2 * 3.0 / nl)


_V5_OFFSETS = ((0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (-0.5, 0.0), (0.0, -0.5))


def yolo_loss_v5(raw_maps: Sequence[jax.Array], heads,
                 labels: jax.Array, num_labels: jax.Array,
                 img_size: int, hyp: YoloHypV5 = YoloHypV5()
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """ultralytics ComputeLoss (yolov5/utils/loss.py:90-216), fixed shapes.

    Differences from the v3 loss: ratio-based anchor match (max(r,1/r) <
    anchor_t), up to 3 grid cells per target (center + 2 nearest via the
    0.5-bias offsets), CIoU box loss, per-layer obj balance [4,1,0.4],
    v5 box decode (2sig-0.5 / (2sig)^2*anchor), total scaled by batch size
    (loss.py:161).
    """
    nc = heads[0].num_classes
    nl = len(raw_maps)
    balance = {3: (4.0, 1.0, 0.4)}.get(nl, (4.0, 1.0, 0.25, 0.06, 0.02))
    total_box = jnp.zeros(())
    total_obj = jnp.zeros(())
    total_cls = jnp.zeros(())

    bsz, m = labels.shape[0], labels.shape[1]
    slot_valid = (jax.lax.broadcasted_iota(jnp.int32, (bsz, m), 1)
                  < num_labels[:, None])
    n_off = len(_V5_OFFSETS)
    offs = jnp.asarray(_V5_OFFSETS, jnp.float32)  # (5, 2)

    for li, (raw, head) in enumerate(zip(raw_maps, heads)):
        p = raw_to_train_layout(raw, head.na, nc).astype(jnp.float32)
        _, na, ny, nx, _ = p.shape
        stride = img_size / max(nx, ny)
        anchor_vec = jnp.asarray(head.anchors_px, jnp.float32) / stride

        gxy = labels[..., 1:3] / stride           # (B, M, 2)
        gwh = labels[..., 3:5] / stride

        # ratio anchor match (loss.py:188-190)
        r = gwh[:, :, None, :] / anchor_vec[None, None]       # (B,M,na,2)
        ratio_ok = jnp.max(jnp.maximum(r, 1.0 / (r + 1e-16)),
                           axis=-1) < hyp.anchor_t            # (B,M,na)
        base_valid = slot_valid[:, :, None] & ratio_ok

        # offset validity (loss.py:193-198): center always; neighbours when
        # the fractional part is on their side and the cell is interior.
        fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
        jm = (fx < 0.5) & (gxy[..., 0] > 1.0)
        km = (fy < 0.5) & (gxy[..., 1] > 1.0)
        lm = ((nx - gxy[..., 0]) % 1.0 < 0.5) & ((nx - gxy[..., 0]) > 1.0)
        mm = ((ny - gxy[..., 1]) % 1.0 < 0.5) & ((ny - gxy[..., 1]) > 1.0)
        off_ok = jnp.stack([jnp.ones_like(jm), jm, km, lm, mm],
                           axis=-1)                            # (B,M,5)
        valid = base_valid[:, :, :, None] & off_ok[:, :, None, :]

        shape = (bsz, m, na, n_off)
        b_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0).ravel()
        a_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 2).ravel()
        o_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 3).ravel()
        vmask = valid.ravel()

        gxy_c = jnp.broadcast_to(gxy[:, :, None, None, :],
                                 shape + (2,)).reshape(-1, 2)
        gwh_c = jnp.broadcast_to(gwh[:, :, None, None, :],
                                 shape + (2,)).reshape(-1, 2)
        off_c = offs[o_idx]
        gij = jnp.floor(gxy_c - off_c)
        gi = jnp.clip(gij[:, 0], 0, nx - 1).astype(jnp.int32)
        gj = jnp.clip(gij[:, 1], 0, ny - 1).astype(jnp.int32)
        tbox = jnp.concatenate(
            [gxy_c - jnp.stack([gi, gj], -1).astype(jnp.float32), gwh_c],
            axis=-1)
        avec = jnp.broadcast_to(anchor_vec[None, None, :, None, :],
                                shape + (2,)).reshape(-1, 2)
        tcls = jnp.broadcast_to(
            labels[..., 0].astype(jnp.int32)[:, :, None, None],
            shape).ravel()

        ps = p[b_idx, a_idx, gj, gi]
        pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(ps[:, 2:4]) * 2.0) * avec
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, tbox, xywh=True, ciou=True)
        total_box = total_box + _masked_mean(1.0 - iou, vmask)

        tobj = jnp.zeros((bsz, na, ny, nx), jnp.float32)
        val = jnp.where(
            vmask,
            (1.0 - hyp.gr)
            + hyp.gr * jnp.clip(jax.lax.stop_gradient(iou), 0.0),
            0.0)
        tobj = tobj.at[b_idx, a_idx, gj, gi].max(val)
        obj_bce = _bce_logits(p[..., 4], tobj, hyp.obj_pw)
        if hyp.fl_gamma > 0:
            obj_bce = _focal(obj_bce, p[..., 4], tobj, hyp.fl_gamma,
                             hyp.fl_alpha)
        total_obj = total_obj + jnp.mean(obj_bce) * balance[li]

        if nc > 1:
            cp = 1.0 - 0.5 * hyp.label_smoothing
            cn = 0.5 * hyp.label_smoothing
            t_one = jnp.where(
                jax.nn.one_hot(tcls, nc, dtype=jnp.float32) > 0, cp, cn)
            cls_bce = _bce_logits(ps[:, 5:], t_one, hyp.cls_pw)
            if hyp.fl_gamma > 0:
                cls_bce = _focal(cls_bce, ps[:, 5:], t_one, hyp.fl_gamma,
                                 hyp.fl_alpha)
            total_cls = total_cls + _masked_mean(
                jnp.mean(cls_bce, axis=-1), vmask)

    lbox = total_box * hyp.box
    lobj = total_obj * hyp.obj
    lcls = total_cls * hyp.cls
    loss = (lbox + lobj + lcls) * bsz  # loss.py:161 scales by batch size
    return loss, {"box": lbox, "obj": lobj, "cls": lcls, "total": loss}
