"""NHWC conv / pooling primitives with exact reference-parity semantics.

These wrap `lax` so every model in the framework shares one conv/pool
vocabulary that XLA maps straight onto the MXU (convs) and VPU (pools).

Parity notes vs the reference (torch, NCHW):
- torch Conv2d(padding=p, dilation=d) == explicit [(p,p),(p,p)] padding with
  rhs_dilation=(d,d). The ACFF block uses p=d-1 so each branch shrinks H,W
  by exactly 2 (reference: code/disaster_detection/model/acff.py:25-35).
- torch MaxPool2d(k,s) default ceil_mode=False == 'VALID' windowing (floor).
- torch AvgPool2d(k,s,p) default count_include_pad=True divides by k*k even
  where the window overlaps padding (reference: squeeze_ernet.py:21 uses
  AvgPool2d(5,1,1) on a 4x4 map -> 2x2). We reproduce that exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_PairT = Union[int, Tuple[int, int]]


def _pair(v: _PairT) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# NHWC activations, HWIO kernels: the TPU-native layout.
_DIMS = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                   ("NHWC", "HWIO", "NHWC"))


def conv2d(x: jax.Array,
           kernel: jax.Array,
           bias: Optional[jax.Array] = None,
           stride: _PairT = 1,
           padding: _PairT = 0,
           dilation: _PairT = 1,
           groups: int = 1,
           accum_dtype=None) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    For floating inputs no preferred_element_type is set: the TPU MXU
    already accumulates bf16 inputs in fp32 internally, and requesting an
    fp32 result explicitly breaks the transpose rule under grad (the f32
    cotangent meets the bf16 kernel -> dtype error). Pass `accum_dtype`
    only for integer convs (e.g. int8 -> int32).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    out = lax.conv_general_dilated(
        x, kernel,
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
    )
    out = out.astype(x.dtype) if accum_dtype is None else out
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def depthwise_conv2d(x: jax.Array,
                     kernel: jax.Array,
                     bias: Optional[jax.Array] = None,
                     stride: _PairT = 1,
                     padding: _PairT = 0,
                     dilation: _PairT = 1) -> jax.Array:
    """Depthwise conv: kernel HWIO with I=1, O=C (feature_group_count=C)."""
    return conv2d(x, kernel, bias, stride, padding, dilation,
                  groups=x.shape[-1])


def max_pool2d(x: jax.Array, kernel: _PairT, stride: Optional[_PairT] = None,
               padding: _PairT = 0) -> jax.Array:
    """Max pool with torch floor semantics (ceil_mode=False)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    # Python-scalar -inf (not finfo.min, not a jnp array) so JAX recognises
    # the max monoid and the op stays reverse-differentiable even under
    # lax.scan linearization.
    neg = (-float("inf") if jnp.issubdtype(x.dtype, jnp.floating)
           else int(jnp.iinfo(x.dtype).min))
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=[(0, 0), (ph, ph), (pw, pw), (0, 0)],
    )


def avg_pool2d(x: jax.Array, kernel: _PairT, stride: Optional[_PairT] = None,
               padding: _PairT = 0, count_include_pad: bool = True) -> jax.Array:
    """Average pool matching torch AvgPool2d.

    count_include_pad=True (torch default) divides every window by k_h*k_w,
    including windows that overlap the zero padding — the geometry the ErNET
    heads rely on (AvgPool2d(5,1,1) over 4x4 -> 2x2).
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    # Scalar-literal init (0.0) keeps the add monoid differentiable under
    # linearization (see max_pool2d note).
    summed = lax.reduce_window(
        x, 0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0, lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=[(0, 0), (ph, ph), (pw, pw), (0, 0)],
    )
    if count_include_pad:
        return (summed / (kh * kw)).astype(x.dtype)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=[(0, 0), (ph, ph), (pw, pw), (0, 0)],
    )
    return (summed / counts).astype(x.dtype)
