"""Batched on-device NMS with fixed shapes.

TPU-native replacement for two reference implementations:
- torchvision batched NMS with the class-offset trick
  (yolov3/utils/utils.py:546-557, the 'vision_batch' default): boxes of
  different classes are shifted by class_id*max_wh so one class-agnostic
  pass does per-class NMS.
- the host-side per-class greedy numpy NMS in the TRT runtime
  (tensorrt_inference/utils/yolo_with_plugins.py:59-97).

Exact greedy semantics (same as both): process candidates in score order;
a candidate survives iff it does not overlap (IoU > threshold) any
*already-kept* candidate. Implemented as a fori_loop over the top-K sorted
candidates updating a keep mask — K vector ops of width K, fully shaped,
fuses with decode into one XLA program. Variable-length results use the
standard TPU fixed-size + valid-count convention.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def xywh_to_xyxy(b: jax.Array) -> jax.Array:
    xy, wh = b[..., :2], b[..., 2:4]
    return jnp.concatenate([xy - wh / 2.0, xy + wh / 2.0], axis=-1)


def exact_topk(key: jax.Array, k: int, chunk: int = 4096):
    """Exact top-k with chunked reduction for long candidate vectors.

    Semantically identical to `jax.lax.top_k(key, k)` INCLUDING
    tie-breaking (ties resolve to the lower index: within a chunk the
    per-chunk top_k orders by index, and across chunks the merge sees
    candidates in chunk-major = ascending-index order). Exactness: any
    global top-k element ranks <= k inside its own chunk, so it survives
    the per-chunk pass.

    MEASURED AND REJECTED as the default (round 5): yolov5s emits
    10,647 candidate boxes/frame and its score+top_k stage is 32% of
    pipeline time (runs/v5s_split_r5.txt), so chunking looked promising —
    but the b128 pipeline measured 6,996 FPS chunked vs 7,104 with the
    plain long-vector `lax.top_k` (the chunk pad/reshape + second top_k
    costs what the shorter sorts save on this XLA lowering). Kept, with
    the tie-exactness test, as the measured-and-rejected record; the
    remaining NMS headroom note in DESIGN.md points at a fused Pallas
    candidate-stream kernel instead."""
    n = key.shape[0]
    if n <= chunk or n <= 2 * k:
        return jax.lax.top_k(key, k)
    c = -(-n // chunk)
    keyp = jnp.pad(key, (0, c * chunk - n), constant_values=-jnp.inf)
    v, i = jax.lax.top_k(keyp.reshape(c, chunk), min(k, chunk))
    idx = (i + (jnp.arange(c) * chunk)[:, None]).reshape(-1)
    vv, sel = jax.lax.top_k(v.reshape(-1), k)
    return vv, idx[sel]


def box_iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU of (N,4) x (M,4) xyxy boxes -> (N,M)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


def _greedy_keep(iou: jax.Array, valid: jax.Array,
                 iou_thres: float) -> jax.Array:
    """Greedy suppression over score-sorted candidates.

    iou: (K,K) IoU matrix of sorted candidates; valid: (K,) bool.
    Returns keep mask (K,).

    EXACT greedy semantics (candidate i survives iff valid and not
    overlapped by a kept j<i), computed as a fixpoint instead of K
    sequential steps: keep is the unique solution of
        keep[i] = valid[i] & ~any_{j<i}(keep[j] & iou[j,i] > thr)
    (unique by forward substitution). The map f(keep) is antitone, so
    Jacobi iteration from keep=valid alternates lower/upper bounds that
    pinch onto the fixpoint in <= suppression-chain-depth steps (~5-10 in
    practice vs K=256..512 loop steps; measured 6.2ms -> sub-ms per
    256-image batch on v5e). Consecutive equal iterates == the fixpoint;
    the while_loop is capped at K where it degenerates to the sequential
    cost.
    """
    k = iou.shape[0]
    lt = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]
    s = (iou > iou_thres) & lt  # s[j, i]: kept j would suppress i

    def cond(carry):
        keep, prev, it = carry
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(carry):
        keep, _, it = carry
        suppressed = jnp.any(keep[:, None] & s, axis=0)
        return valid & ~suppressed, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    return keep


def _and_keep(iou: jax.Array, valid: jax.Array, same_cls: jax.Array,
              iou_thres: float) -> jax.Array:
    """'and'-NMS (utils.py:591-597): a head box is kept only if it overlaps
    (IoU > 0.5) another still-alive box of its class; the head suppresses
    later boxes (IoU >= iou_thres) whether or not it was kept. Classes with
    a single candidate skip NMS entirely (utils.py:570-572)."""
    k = iou.shape[0]
    pos = jnp.arange(k)

    def body(i, carry):
        alive, keep = carry
        later_alive = alive & (pos > i) & same_cls[i]
        overlap = jnp.max(jnp.where(later_alive, iou[i], 0.0))
        keep_i = alive[i] & valid[i] & (overlap > 0.5)
        suppress = alive[i] & valid[i] & later_alive & (iou[i] >= iou_thres)
        return alive & ~suppress, keep.at[i].set(keep_i)

    _, keep = jax.lax.fori_loop(
        0, k, body, (valid, jnp.zeros((k,), bool)))
    cls_count = jnp.sum(same_cls & valid[None, :], axis=1)
    return keep | (valid & (cls_count == 1))


@partial(jax.jit,
         static_argnames=("max_det", "top_k", "multi_label",
                          "class_agnostic", "method", "classes"))
def batched_nms(pred: jax.Array,
                conf_thres: float = 0.001,
                iou_thres: float = 0.6,
                max_det: int = 300,
                top_k: int = 512,
                multi_label: bool = False,
                class_agnostic: bool = False,
                max_wh: float = 4096.0,
                min_wh: float = 2.0,
                method: str = "greedy",
                classes: Optional[Tuple[int, ...]] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """NMS over decoded predictions.

    pred: (B, N, 5+nc) — cx,cy,w,h,obj,cls_probs (all sigmoided).
    Returns (det, count): det (B, max_det, 6) = x1,y1,x2,y2,conf,cls
    (zero-padded), count (B,) valid rows. Scores are obj*cls (utils.py:510).

    Matches the reference filter chain (utils.py:488-533): obj > conf_thres
    first, then the (min_wh, max_wh)-pixel width/height constraint, then
    either best-class rows or — with multi_label (the reference default
    whenever nc > 1) — one row per (box, class) with obj*cls > conf_thres.
    methods: greedy ('vision_batch'/'or'), merge, soft, and.
    `classes` (static tuple of class ids) drops rows whose assigned class
    is not listed — the --classes filter (utils.py:536-537 /
    yolov5 general.py:536: rows filtered on the FINAL class column, after
    best-class/multi-label assignment).
    """
    if method not in ("greedy", "or", "vision_batch", "merge", "soft",
                      "and"):
        # user-facing (spec.json nms_method / --nms-method); an unknown
        # string must not silently run greedy semantics
        raise ValueError(f"unknown NMS method {method!r}")
    nc = pred.shape[-1] - 5
    multi = multi_label and nc > 1
    allowed = None
    if classes is not None:
        import numpy as np
        a = np.zeros((nc,), bool)
        a[[c for c in classes if 0 <= int(c) < nc]] = True
        allowed = jnp.asarray(a)

    def single(p):
        boxes = xywh_to_xyxy(p[:, :4])
        obj = p[:, 4]
        base_ok = ((obj > conf_thres)
                   & jnp.all((p[:, 2:4] > min_wh) & (p[:, 2:4] < max_wh),
                             axis=-1))
        cls_probs = p[:, 5:] * obj[:, None]

        if multi:
            # one candidate per (box, class) above conf (utils.py:527-529)
            n = cls_probs.shape[0]
            flat = cls_probs.reshape(-1)
            flat_box = jnp.repeat(jnp.arange(n), nc)
            flat_cls = jnp.tile(jnp.arange(nc), n)
            ok = base_ok[flat_box] & (flat > conf_thres)
            if allowed is not None:
                ok &= allowed[flat_cls]
            key = jnp.where(ok, flat, -1.0)
            k = min(top_k, key.shape[0])
            top_scores, idx = jax.lax.top_k(key, k)
            top_boxes = boxes[flat_box[idx]]
            top_cls = flat_cls[idx]
        else:
            # best class only (utils.py:531-533): note the reference
            # thresholds only obj here, not obj*cls
            best_cls = jnp.argmax(cls_probs, axis=-1)
            score = jnp.max(cls_probs, axis=-1)
            ok = (base_ok if allowed is None
                  else base_ok & allowed[best_cls])
            key = jnp.where(ok, score, -1.0)
            k = min(top_k, key.shape[0])
            top_scores, idx = jax.lax.top_k(key, k)
            top_boxes = boxes[idx]
            top_cls = best_cls[idx]
        valid = top_scores > -0.5  # -1.0 marks masked candidates

        if class_agnostic:
            nms_boxes = top_boxes
        else:
            offset = top_cls.astype(jnp.float32)[:, None] * max_wh
            nms_boxes = top_boxes + offset  # class-offset trick
        iou = box_iou_matrix(nms_boxes, nms_boxes)

        if method == "soft":
            # soft-NMS, reference-exact (utils.py:610-618, arXiv
            # 1704.04503): walk candidates in original score order; each
            # emitted box Gaussian-decays every later same-class box by
            # exp(-iou^2/0.5) (ANY overlap, not just > iou_thres — the
            # class-offset boxes make cross-class iou 0, i.e. decay 1);
            # boxes whose decayed score falls <= conf_thres are dropped
            # and decay nobody. Emitted confidences are the decayed ones.
            sigma = 0.5
            kk = iou.shape[0]
            pos = jnp.arange(kk)
            # The reference emits each class's first candidate BEFORE any
            # conf filtering (det_max.append(dc[:1]) precedes the
            # `dc[:, 4] > conf_thres` drop, utils.py:613-618), so in
            # best-class mode a class head whose obj*cls score is below
            # conf_thres (candidates are obj-only prefiltered) is still
            # emitted. Exempt per-class heads from the conf gate.
            same = (jnp.ones((kk, kk), bool) if class_agnostic
                    else top_cls[:, None] == top_cls[None, :])
            later = pos[:, None] > pos[None, :]  # [i, j]: j precedes i
            head = valid & ~jnp.any(same & later & valid[None, :], axis=1)

            def soft_body(i, carry):
                scores, keep = carry
                alive = valid[i] & ((scores[i] > conf_thres) | head[i])
                decay = jnp.exp(-jnp.square(iou[i]) / sigma)
                scores = jnp.where((pos > i) & alive, scores * decay,
                                   scores)
                return scores, keep.at[i].set(alive)

            soft_scores, keep = jax.lax.fori_loop(
                0, kk, soft_body,
                (top_scores, jnp.zeros((kk,), bool)))
            top_scores = jnp.where(keep, soft_scores, 0.0)
        elif method == "and":
            keep = _and_keep(iou, valid,
                             top_cls[:, None] == top_cls[None, :], iou_thres)
        else:  # greedy == the reference's 'vision_batch' and 'or' methods
            keep = _greedy_keep(iou, valid, iou_thres)
            if method == "merge":
                # merge-NMS, yolov5 semantics (general.py:571-577): every
                # kept box becomes the score-weighted average of ALL
                # same-class candidates with iou > thres — including ones
                # an earlier kept head also weighted in — and (the
                # `redundant` flag, hardwired True there) a kept box whose
                # only qualifying overlap is itself is DROPPED. (yolov3's
                # 'merge', utils.py:600-606, instead REMOVES consumed
                # boxes from later merges; we implement the v5 formula.)
                overlap = (iou > iou_thres) & valid[None, :]
                w = jnp.where(overlap, top_scores[None, :], 0.0)  # (i, j)
                merged = (w @ top_boxes) / jnp.maximum(
                    jnp.sum(w, axis=1, keepdims=True), 1e-9)
                top_boxes = jnp.where(keep[:, None], merged, top_boxes)
                keep &= jnp.sum(overlap, axis=1) > 1  # require redundancy

        kept_scores = jnp.where(keep, top_scores, -1.0)
        order = jnp.argsort(-kept_scores)[:max_det]
        sel = keep[order]
        det = jnp.concatenate(
            [top_boxes[order], top_scores[order][:, None],
             top_cls[order].astype(jnp.float32)[:, None]], axis=-1)
        det = jnp.where(sel[:, None], det, 0.0)
        return det, jnp.sum(sel.astype(jnp.int32))

    return jax.vmap(single)(pred)


def scale_coords(det: jax.Array, model_hw: Tuple[int, int],
                 orig_hw: Tuple[int, int],
                 letterboxed: bool = True,
                 ratio_pad=None) -> jax.Array:
    """Map x1,y1,x2,y2 from model-input space back to the original frame
    (yolov3/utils/utils.py scale_coords semantics).

    `ratio_pad=(gain, (pad_w, pad_h))` overrides the recomputed fit with
    the letterbox that was ACTUALLY applied (the reference's ratio_pad
    arg, yolov5/utils/general.py:391-404 via test.py:137) — required
    whenever a gain cap bound (no-upscale eval, pad-inflated rect
    buckets), where min(mh/oh, mw/ow) is not the applied gain."""
    mh, mw = model_hw
    oh, ow = orig_hw
    if letterboxed:
        if ratio_pad is not None:
            gain = float(ratio_pad[0])
            pad_w, pad_h = float(ratio_pad[1][0]), float(ratio_pad[1][1])
        else:
            gain = min(mh / oh, mw / ow)
            pad_w, pad_h = (mw - ow * gain) / 2.0, (mh - oh * gain) / 2.0
        boxes = det[..., :4]
        boxes = (boxes - jnp.array([pad_w, pad_h, pad_w, pad_h])) / gain
    else:
        boxes = det[..., :4] * jnp.array([ow / mw, oh / mh, ow / mw, oh / mh])
    boxes = jnp.clip(boxes, 0.0, jnp.array([ow, oh, ow, oh], jnp.float32))
    return jnp.concatenate([boxes, det[..., 4:]], axis=-1)
