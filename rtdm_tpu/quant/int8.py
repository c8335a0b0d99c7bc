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


def seal_kernel(kernel: np.ndarray):
    """fp32 kernel -> (int8 codes, fp32 per-output-channel scale) for
    SEALED engine storage (the engine file carries int8 weights, like a
    real serialized TRT int8 engine). Dequantizing `codes * scale`
    reproduces `quantize_kernel_per_channel(kernel)` bit-exactly, and
    re-quantizing the dequantized kernel is a fixed point (the absmax
    element always maps to ±127, so the recovered scale is identical)."""
    k = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)), keepdims=True)
    scale = (np.maximum(absmax, 1e-12) / 127.0).astype(np.float32)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    def walk(node):
        if isinstance(node, dict):
            return {k: (quantize_kernel_per_channel(v) if k == "kernel"
                        else walk(v)) for k, v in node.items()}
        return node
    return walk(params)


def _prep_int8_kernel(kernel: np.ndarray):
    """HWIO 1x1 kernel -> (int8 (I,O), per-O scale) for real int8 matmul."""
    k = np.asarray(kernel, np.float32)[0, 0]          # (I, O)
    absmax = np.max(np.abs(k), axis=0, keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale[0].astype(np.float32)             # (I,O), (O,)


def int8_pointwise(x, kq, kscale, bias, act_scale):
    """Real int8 MXU path for a 1x1 conv: quantize activations on the fly,
    int8 x int8 -> int32 matmul, dequantize in the epilogue.

    Exact int32 accumulation — numerically at least as accurate as the
    QDQ simulation with the same scales. Measured 1.6x MXU throughput vs
    bf16 on v5e (133.8 vs 82.9 TOPS at 8192x2048x2048).
    """
    import jax.numpy as jnp

    b, h, w, c = x.shape
    q = jnp.clip(jnp.round(x / act_scale), -127, 127).astype(jnp.int8)
    acc = jnp.dot(q.reshape(-1, c), kq,
                  preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (act_scale * kscale)[None, :]
    out = out + bias[None, :]
    return out.reshape(b, h, w, -1)


def int8_classifier_forward(model, variables: Dict[str, Any],
                            act_scales: Dict[str, np.ndarray]):
    """True-int8 inference forward for the ErNET family.

    The 1x1 fuse convs run as int8 MXU matmuls with calibrated activation
    scales; depthwise branches, pooling and BN stay bf16. Numerically: at
    least QDQ-accurate (int32 accumulation; measured 99.5% argmax
    agreement with bf16 on the reference checkpoint).

    MEASURED (TPU v5e, batch 2048/4096, 2026-08): ~8k FPS vs bf16's ~95k —
    raw int8 MXU is 1.6x bf16 at large K (133.8 vs 82.9 TOPS at K=2048),
    but at ErNET's tiny contractions (K=48..384) the per-pixel
    quantize/dequantize traffic dwarfs the matmul savings. int8 engines
    therefore default to the QDQ path (accuracy simulation) with bf16
    compute; this function remains for models with large matmuls.
    """
    import jax
    import jax.numpy as jnp

    from rtdm_tpu.models.ernet import (ErNET, SqueezeErNET, SqueezeRedConv,
                                       _nchw_flatten)
    from rtdm_tpu.ops.convpool import avg_pool2d, conv2d, depthwise_conv2d, \
        max_pool2d

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    # prepare all int8 kernels EAGERLY — creating constants inside a traced
    # function and caching them across traces leaks tracers
    prepped: Dict[str, Any] = {}
    for name, sub in params.items():
        if isinstance(sub, dict) and "fused_conv" in sub:
            key = f"{name}/fused_conv"
            kq, ks = _prep_int8_kernel(sub["fused_conv"]["kernel"])
            prepped[key] = (jnp.asarray(kq), jnp.asarray(ks),
                            jnp.asarray(sub["fused_conv"]["bias"],
                                        jnp.float32),
                            float(act_scales[key]))

    def acff(name, x):
        p = params[name]
        st = stats[name]["batch_norm"]
        branches = []
        for i, (pad, dil) in enumerate([(0, 1), (1, 2), (2, 3)], start=1):
            kb = p[f"conv{i}"]
            branches.append(depthwise_conv2d(
                x, jnp.asarray(kb["kernel"], x.dtype),
                jnp.asarray(kb["bias"], x.dtype), padding=pad,
                dilation=dil))
        cat = jnp.concatenate(branches, axis=-1).astype(jnp.float32)
        kq, ks, bias, s = prepped[f"{name}/fused_conv"]
        out = int8_pointwise(cat, kq, ks, bias, s)
        out = jnp.where(out > 0, out, 0.01 * out)      # LeakyReLU(0.01)
        scale = jnp.asarray(p["batch_norm"]["scale"]) * jax.lax.rsqrt(
            jnp.asarray(st["var"]) + 1e-5)
        shift = jnp.asarray(p["batch_norm"]["bias"]) - \
            jnp.asarray(st["mean"]) * scale
        return (out * scale + shift).astype(jnp.bfloat16)

    def conv(name, x, stride=1):
        p = params[name]
        return conv2d(x, jnp.asarray(p["kernel"], x.dtype),
                      (jnp.asarray(p["bias"], x.dtype)
                       if "bias" in p else None), stride=stride)

    def head(x, pool_padding):
        hp = params["head"]
        x = conv2d(x.astype(jnp.float32),
                   jnp.asarray(hp["conv2"]["kernel"], jnp.float32))
        x = avg_pool2d(x, 5, 1, pool_padding, count_include_pad=True)
        x = _nchw_flatten(x)
        x = x @ jnp.asarray(hp["fc"]["kernel"]) + \
            jnp.asarray(hp["fc"]["bias"])
        return jax.nn.softmax(x, axis=-1)

    if isinstance(model, SqueezeErNET):
        def forward(x):
            x = x.astype(jnp.bfloat16)
            x = conv("conv1", x, 2)
            for name in ("acff1", "acff2", "acff3", "acff4"):
                x = acff(name, x)
                if name != "acff4":
                    x = max_pool2d(x, 2, 2)
            return head(x, 1)
    elif isinstance(model, SqueezeRedConv):
        def forward(x):
            x = x.astype(jnp.bfloat16)
            x = conv("conv1", x, 2)
            x = conv("conv_red1", x)
            x = acff("acff1", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff2", x)
            x = conv("conv_red2", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff3", x)
            x = max_pool2d(x, 2, 2)
            x = conv("conv_red3", x)
            x = acff("acff4", x)
            return head(x, 1)
    elif isinstance(model, ErNET):
        def forward(x):
            x = x.astype(jnp.bfloat16)
            x = conv("conv1", x, 2)
            for i, name in enumerate(("acff1", "acff2", "acff3")):
                x = acff(name, x)
                x = max_pool2d(x, 2, 2)
            for name in ("acff4", "acff5", "acff6"):
                x = acff(name, x)
            return head(x, 0)
    else:
        raise TypeError(f"unsupported model {type(model)}")
    return forward


def quantize_classifier_apply(model, variables: Dict[str, Any],
                              act_scales: Optional[Dict[str, np.ndarray]],
                              apply_softmax: bool = True):
    """Build an int8 apply(u8_batch) -> probs (or logits) function."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rtdm_tpu.data.aider import normalize_batch
    from rtdm_tpu.models.layers import Conv, Dense, DepthwiseConv

    # QDQ-on-bf16 (CLAUDE.md measured conclusion; mirrors the bf16 engine
    # branch engine.py and the detector int8 path): the QDQ'd weights are
    # CAST to bfloat16 so the convs run the bf16 MXU path — leaving them
    # fp32 would run the "int8" engine at half throughput for no fidelity
    # gain (the quantization error is already baked in by the QDQ).
    from rtdm_tpu.core.precision import _cast_floating
    qparams = _cast_floating(quantize_params(variables["params"]),
                             jnp.bfloat16)
    qvars = {"params": qparams,
             "batch_stats": variables.get("batch_stats", {})}
    scales = {k: float(v) for k, v in (act_scales or {}).items()}

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, (Conv, DepthwiseConv, Dense))
                and context.method_name == "__call__"):
            path = "/".join(context.module.path)
            s = scales.get(path)
            if s is not None:
                # QDQ rounds in fp32 so codes match a true-int8 engine
                # (bf16's 8-bit mantissa lands x/scale off-by-one near code
                # boundaries) — same as the detector qdq_interceptor
                x0 = args[0]
                args = (fake_quant_tensor(x0.astype(jnp.float32), s)
                        .astype(x0.dtype),) + args[1:]
        return next_fun(*args, **kwargs)

    def apply_fn(u8):
        x = normalize_batch(u8).astype(jnp.bfloat16)
        with nn.intercept_methods(interceptor):
            out = model.apply(qvars, x, train=False,
                              apply_softmax=apply_softmax)
        return out.astype(jnp.float32)

    return apply_fn
