"""int8 (w8a8) quantized classifier inference.

The reference's int8 path lives in TRT (entropy-calibrated engines,
onnx_to_tensorrt.py:97-103; the classifier branch in
build_tensorrt_model.py:256-259 is stubbed). Here:

- Weights: symmetric per-output-channel int8 (absmax/127) on every conv /
  dense kernel.
- Activations: symmetric per-tensor int8 with calibrated scales
  (quant/calibrate.py) at every Conv/DepthwiseConv/Dense input, applied via
  flax method interception — model-agnostic.

This is quantize-dequantize (fake-quant) semantics: numerics match an int8
engine exactly, compute runs on the bf16 MXU path. A Pallas int8-MXU kernel
for the 1x1 fuse convs (where the FLOPs are) is the planned fast path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def fake_quant_tensor(x, scale):
    """Symmetric int8 quantize-dequantize with a fixed scale."""
    import jax.numpy as jnp
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    return q * scale


def quantize_kernel_per_channel(kernel: np.ndarray) -> np.ndarray:
    """Per-output-channel (last axis) symmetric int8 QDQ of an HWIO/IO kernel."""
    k = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)), keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(k / scale), -127, 127)
    return (q * scale).astype(np.float32)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    def walk(node):
        if isinstance(node, dict):
            return {k: (quantize_kernel_per_channel(v) if k == "kernel"
                        else walk(v)) for k, v in node.items()}
        return node
    return walk(params)


def quantize_classifier_apply(model, variables: Dict[str, Any],
                              act_scales: Optional[Dict[str, np.ndarray]]):
    """Build an int8 apply(u8_batch) -> probs function."""
    import jax.numpy as jnp
    from flax import linen as nn

    from rtdm_tpu.data.aider import normalize_batch
    from rtdm_tpu.models.layers import Conv, Dense, DepthwiseConv

    qvars = {"params": quantize_params(variables["params"]),
             "batch_stats": variables.get("batch_stats", {})}
    scales = {k: float(v) for k, v in (act_scales or {}).items()}

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, (Conv, DepthwiseConv, Dense))
                and context.method_name == "__call__"):
            path = "/".join(context.module.path)
            s = scales.get(path)
            if s is not None:
                args = (fake_quant_tensor(args[0], s),) + args[1:]
        return next_fun(*args, **kwargs)

    def apply_fn(u8):
        x = normalize_batch(u8)
        with nn.intercept_methods(interceptor):
            out = model.apply(qvars, x, train=False)
        return out.astype(jnp.float32)

    return apply_fn
