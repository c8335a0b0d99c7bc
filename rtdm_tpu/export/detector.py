"""Compiled end-to-end detector: normalize -> darknet graph -> decode ->
NMS in ONE jitted XLA program.

This is the TPU analogue of the reference's TRT engine + plugin + host NMS
pipeline (tensorrt_inference/utils/yolo_with_plugins.py:25-162) — except
the decode and NMS stay on device, so the host receives only (max_det, 6)
boxes + a count per frame instead of full feature maps.

Detection preprocessing divides by 255 only (no ImageNet normalize) —
darknet convention (yolov3/detect.py img/255).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class DetectorSpec:
    cfg_name: str
    img_size: int = 416
    conf_thres: float = 0.25
    iou_thres: float = 0.45
    max_det: int = 300
    top_k: int = 512
    quant: str = "bf16"            # fp32 | bf16 | int8
    version: str = "1"


class Detector:
    """Callable over uint8 letterboxed NHWC batches -> (det, count)."""

    def __init__(self, model, variables: Dict[str, Any], spec: DetectorSpec,
                 batch_size: int = 1):
        import jax
        import jax.numpy as jnp

        from rtdm_tpu.ops.nms import batched_nms
        from rtdm_tpu.ops.yolo import decode_all

        self.spec = spec
        self.model = model
        self.batch_size = batch_size
        heads = model.bind(variables).heads
        quant = {"fp16": "bf16", "half": "bf16"}.get(spec.quant, spec.quant)
        dtype = jnp.bfloat16 if quant == "bf16" else jnp.float32
        params = variables["params"]
        if quant == "int8":
            from rtdm_tpu.quant.int8 import quantize_params
            params = quantize_params(jax.device_get(params))
            dtype = jnp.bfloat16
        cast = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        vars_c = {"params": cast,
                  "batch_stats": variables.get("batch_stats", {})}

        def fwd(u8):
            x = (u8.astype(dtype) / 255.0)
            raw = model.apply(vars_c, x, train=False)
            pred = decode_all(raw, heads, spec.img_size)
            return batched_nms(pred, spec.conf_thres, spec.iou_thres,
                               spec.max_det, spec.top_k)

        s = spec.img_size
        self._fn = (jax.jit(fwd)
                    .lower(jax.ShapeDtypeStruct((batch_size, s, s, 3),
                                                jnp.uint8))
                    .compile())

    def __call__(self, images_u8: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp
        n = images_u8.shape[0]
        b = self.batch_size
        if n < b:
            pad = np.zeros((b - n,) + images_u8.shape[1:], images_u8.dtype)
            images_u8 = np.concatenate([images_u8, pad])
        elif n > b:
            raise ValueError(f"batch {n} exceeds detector batch {b}")
        det, count = self._fn(jnp.asarray(images_u8))
        return np.asarray(det)[:n], np.asarray(count)[:n]


def build_detector(cfg_path: str, variables: Dict[str, Any],
                   spec: Optional[DetectorSpec] = None,
                   batch_size: int = 1):
    from rtdm_tpu.models.darknet import create_darknet

    spec = spec or DetectorSpec(cfg_name=os.path.basename(cfg_path))
    model = create_darknet(cfg_path)
    return Detector(model, variables, spec, batch_size)
