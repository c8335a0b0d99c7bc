"""Small linen building blocks shared by all model families.

Named so that parameter trees mirror the reference's state_dict structure,
which makes torch-weight import (models/torch_import.py) mechanical.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtdm_tpu.ops.convpool import conv2d, depthwise_conv2d

PairT = Union[int, Tuple[int, int]]


def _pair(v: PairT) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """Conv2d with explicit torch-style padding/dilation/groups. NHWC/HWIO."""
    features: int
    kernel_size: PairT = 3
    stride: PairT = 1
    padding: PairT = 0
    dilation: PairT = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (kh, kw, in_ch // self.groups, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        kernel = kernel.astype(x.dtype)
        return conv2d(x, kernel, bias, self.stride, self.padding,
                      self.dilation, self.groups)


class DepthwiseConv(nn.Module):
    """Depthwise Conv2d (torch groups=in_channels)."""
    kernel_size: PairT = 3
    stride: PairT = 1
    padding: PairT = 0
    dilation: PairT = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (kh, kw, 1, in_ch), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (in_ch,),
                           jnp.float32) if self.use_bias else None)
        kernel = kernel.astype(x.dtype)
        return depthwise_conv2d(x, kernel, bias, self.stride, self.padding,
                                self.dilation)


class BatchNorm(nn.Module):
    """BatchNorm2d over NHWC with optional cross-replica stat sync.

    `axis_name` — when set (e.g. 'data'), batch statistics are averaged over
    that mesh axis with lax.pmean: the TPU-native SyncBatchNorm (reference:
    yolov3/models.py:36 uses nn.SyncBatchNorm unconditionally; yolov5 opt-in
    at train.py:182-185).

    torch momentum 0.1 == `momentum=0.1` here: new = (1-m)*old + m*batch.
    """
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((ch,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((ch,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            # torch tracks the *unbiased* variance in running stats.
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(x.dtype)


class Dense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        # no preferred_element_type: see ops/convpool.conv2d — it breaks
        # the transpose rule under grad with bf16 inputs
        out = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


class FReLU(nn.Module):
    """Funnel activation max(x, BN(dwconv_kxk(x)))
    (yolov5/utils/activations.py:47-55)."""
    k: int = 3
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = DepthwiseConv(self.k, 1, padding=self.k // 2, use_bias=False,
                          name="conv")(x)
        # v5's initialize_weights sets eps=1e-3/momentum=0.03 on every BN
        # in the model, this one included (torch_utils.py:151-158)
        y = BatchNorm(momentum=0.03, epsilon=1e-3, axis_name=self.bn_axis,
                      name="bn")(y, train)
        return jnp.maximum(x, y)


class AconC(nn.Module):
    """ACON-C: (p1-p2)*x * sigmoid(beta*(p1-p2)*x) + p2*x with learnable
    per-channel p1/p2/beta (yolov5/utils/activations.py:58-73)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch = x.shape[-1]
        p1 = self.param("p1", nn.initializers.normal(1.0), (ch,),
                        jnp.float32)
        p2 = self.param("p2", nn.initializers.normal(1.0), (ch,),
                        jnp.float32)
        beta = self.param("beta", nn.initializers.ones, (ch,), jnp.float32)
        dpx = ((p1 - p2) * x.astype(jnp.float32))
        out = dpx * jax.nn.sigmoid(beta * dpx) + p2 * x.astype(jnp.float32)
        return out.astype(x.dtype)


class MetaAconC(nn.Module):
    """ACON-C with beta generated by a squeeze-excite-style 1x1 bottleneck
    over the spatially-pooled input (yolov5/utils/activations.py:76-98,
    BN-free per the upstream batch-size-1 bug patch)."""
    r: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch = x.shape[-1]
        hidden = max(self.r, ch // self.r)
        p1 = self.param("p1", nn.initializers.normal(1.0), (ch,),
                        jnp.float32)
        p2 = self.param("p2", nn.initializers.normal(1.0), (ch,),
                        jnp.float32)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = Conv(hidden, 1, name="fc1")(y)
        y = Conv(ch, 1, name="fc2")(y)
        beta = jax.nn.sigmoid(y)
        dpx = (p1 - p2) * x.astype(jnp.float32)
        out = dpx * jax.nn.sigmoid(beta * dpx) + p2 * x.astype(jnp.float32)
        return out.astype(x.dtype)
