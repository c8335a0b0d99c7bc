"""Second-stage classifier veto over detection crops — apply_classifier.

TPU-native analogue of the reference's ``apply_classifier``
(ref: yolov5/utils/general.py:apply_classifier and the identical
yolov3/utils/utils.py variant, wired into both detect.py files behind
the ``classify`` switch, yolov5/detect.py:43-44,78-79): each surviving
detection box is squared, padded (w,h -> max(w,h)*1.3 + 30 px), cropped
from the frame, resized, and re-classified; detections whose classifier
argmax disagrees with the detector's class id are dropped.

The reference does this on host — a Python loop of cv2 crops + resizes
feeding a torchvision ResNet per image. Here the entire veto is ONE
fixed-shape jitted XLA program: box squaring, a bilinear crop-resize
gather over all max_det rows at once, the classifier forward, and a
stable compaction of the surviving rows. Two deliberate deltas:
- crops come from the model-input (letterboxed) frame already resident
  in HBM rather than re-cropping the original on host — content is
  identical up to the resize the classifier applies anyway;
- padded boxes are clamped to the frame (the reference's negative crop
  starts silently wrap via Python slicing — a latent bug there).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def square_pad_boxes(xyxy, gain: float = 1.3, pad: float = 30.0):
    """Reference box prep (general.py apply_classifier): xyxy -> xywh,
    rectangle -> square via max(w, h), scale by `gain` and add `pad` px,
    back to xyxy, truncated to ints (torch ``.long()``)."""
    import jax.numpy as jnp

    cx = (xyxy[..., 0] + xyxy[..., 2]) / 2
    cy = (xyxy[..., 1] + xyxy[..., 3]) / 2
    side = jnp.maximum(xyxy[..., 2] - xyxy[..., 0],
                       xyxy[..., 3] - xyxy[..., 1]) * gain + pad
    half = side / 2
    out = jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=-1)
    return jnp.trunc(out).astype(jnp.int32)


def crop_resize_bilinear(img, boxes_xyxy, out_hw: Tuple[int, int]):
    """Crop integer boxes from one HxWx3 frame and bilinear-resize each to
    `out_hw`, matching cv2.resize INTER_LINEAR on the cropped array
    (the reference's ``cv2.resize(cutout, (224, 224))``): output pixel j
    samples input coordinate x0 + (j+.5)*w/ow - .5, edges clamped to the
    crop. Fixed-shape gather, vmapped over boxes -> (N, oh, ow, 3)."""
    import jax
    import jax.numpy as jnp

    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw
    imf = img.astype(jnp.float32)

    def one(box):
        x0 = jnp.clip(box[0], 0, W - 1)
        y0 = jnp.clip(box[1], 0, H - 1)
        x1 = jnp.clip(box[2], x0 + 1, W)
        y1 = jnp.clip(box[3], y0 + 1, H)
        bw = (x1 - x0).astype(jnp.float32)
        bh = (y1 - y0).astype(jnp.float32)
        xs = x0 + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * bw / ow - 0.5
        ys = y0 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * bh / oh - 0.5
        xs = jnp.clip(xs, x0, x1.astype(jnp.float32) - 1)
        ys = jnp.clip(ys, y0, y1.astype(jnp.float32) - 1)
        xi = jnp.floor(xs)
        yi = jnp.floor(ys)
        fx = (xs - xi)[None, :, None]
        fy = (ys - yi)[:, None, None]
        xi = xi.astype(jnp.int32)
        yi = yi.astype(jnp.int32)
        xj = jnp.minimum(xi + 1, x1 - 1)
        yj = jnp.minimum(yi + 1, y1 - 1)
        r0 = imf[yi]                       # (oh, W, 3)
        r1 = imf[yj]
        top = r0[:, xi] * (1 - fx) + r0[:, xj] * fx
        bot = r1[:, xi] * (1 - fx) + r1[:, xj] * fx
        return top * (1 - fy) + bot * fy

    return jax.vmap(one)(boxes_xyxy)


class SecondStageClassifier:
    """Compiled apply_classifier veto: ``(frames_u8, det, count) ->
    (det', count')`` with matching-class rows stably compacted forward.

    `model` is any rtdm classifier module (``create_model(...)``) whose
    label space covers the detector's class ids — the analogue of the
    reference's ``load_classifier(name, n=nc)`` second-stage net
    (ref: yolov3/utils/torch_utils.py:load_classifier). `class_map`
    optionally translates detector class id -> classifier class id.
    """

    def __init__(self, model, variables: Dict[str, Any],
                 frame_hw: Tuple[int, int], max_det: int,
                 batch_size: int = 1, normalize: bool = True,
                 quant: str = "bf16",
                 class_map: Optional[Dict[int, int]] = None):
        import jax
        import jax.numpy as jnp

        from rtdm_tpu.data.aider import normalize_batch

        size = int(getattr(model, "image_size", 224))
        from rtdm_tpu.core.precision import _cast_floating
        dtype = jnp.bfloat16 if quant in ("bf16", "fp16", "half") \
            else jnp.float32
        cast = _cast_floating(variables["params"], dtype)
        vars_c = {"params": cast,
                  "batch_stats": variables.get("batch_stats", {})}
        if class_map:
            lut = np.arange(max(class_map) + 1, dtype=np.int32)
            for k, v in class_map.items():
                lut[k] = v
            lut = jnp.asarray(lut)
        else:
            lut = None

        def veto_one(frame_u8, det, count):
            boxes = square_pad_boxes(det[:, :4])
            crops = crop_resize_bilinear(frame_u8, boxes, (size, size))
            x = (normalize_batch(crops) if normalize
                 else crops / 255.0).astype(dtype)
            logits = model.apply(vars_c, x, train=False,
                                 apply_softmax=False)
            pred2 = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            cls1 = det[:, 5].astype(jnp.int32)
            if lut is not None:
                # ids beyond the mapped range pass through as identity —
                # the clamp alone would remap them through lut's last row
                mapped = lut[jnp.clip(cls1, 0, lut.shape[0] - 1)]
                want = jnp.where(cls1 < lut.shape[0], mapped, cls1)
            else:
                want = cls1
            valid = jnp.arange(det.shape[0]) < count
            keep = valid & (pred2 == want)
            order = jnp.argsort(~keep, stable=True)   # stable compaction
            det2 = det[order] * keep[order][:, None]  # zero dropped rows
            return det2, keep.sum().astype(count.dtype)

        def fn(frames_u8, det, count):
            return jax.vmap(veto_one)(frames_u8, det, count)

        h, w = frame_hw
        self.batch_size = batch_size
        self.max_det = max_det
        self._fn = (jax.jit(fn)
                    .lower(jax.ShapeDtypeStruct((batch_size, h, w, 3),
                                                jnp.uint8),
                           jax.ShapeDtypeStruct((batch_size, max_det, 6),
                                                jnp.float32),
                           jax.ShapeDtypeStruct((batch_size,), jnp.int32))
                    .compile())

    def __call__(self, frames_u8: np.ndarray, det: np.ndarray,
                 count: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp
        d, c = self._fn(jnp.asarray(frames_u8),
                        jnp.asarray(det, np.float32),
                        jnp.asarray(count, np.int32))
        return np.asarray(d), np.asarray(c)


def build_second_stage(model_name: str, weights: Optional[str],
                       frame_hw: Tuple[int, int], max_det: int,
                       batch_size: int = 1, quant: str = "bf16",
                       class_map: Optional[Dict[int, int]] = None
                       ) -> SecondStageClassifier:
    """CLI helper: classifier by name + checkpoint (.pt state_dict or
    .npz) -> compiled veto stage (detect.py:43-44 modelc load)."""
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.io import infer_num_classes

    if weights is None:
        raise ValueError("--classifier-weights is required with --classify")
    if weights.endswith(".npz"):
        from rtdm_tpu.models.io import load_variables
        variables = load_variables(weights)
    else:
        from rtdm_tpu.models.torch_import import load_classifier_checkpoint
        variables = load_classifier_checkpoint(weights)
    # the head must match the CHECKPOINT's label space, not the registry
    # default — a 10-class veto classifier would otherwise fail to apply
    model = create_model(model_name,
                         num_classes=infer_num_classes(variables) or 5)
    return SecondStageClassifier(model, variables, frame_hw, max_det,
                                 batch_size=batch_size, quant=quant,
                                 class_map=class_map)
