"""ACFF — Atrous Convolution Feature Fusion block, TPU-native.

Semantics match the reference block (code/disaster_detection/model/acff.py:25-54):
three parallel depthwise 3x3 convs at dilation 1/2/3 with padding 0/1/2 (each
branch therefore shrinks H,W by exactly 2), channel-concat, 1x1 fuse conv,
then — in this exact, slightly unusual order — LeakyReLU(0.01) BEFORE
BatchNorm, then Dropout(0.2).

TPU notes: the three branches + concat + 1x1 are expressed as plain XLA ops
here (XLA fuses the elementwise tail into the 1x1 matmul); a hand-fused
Pallas variant lives in ops/acff_pallas.py and is selected via `fused=True`
once validated against this module.

There is also a *detector* ACFF variant with additive fusion
(yolov3/models.py:265-315, `conv1+conv2+conv3`) — that one lives with the
darknet graph builder, not here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtdm_tpu.models.layers import BatchNorm, Conv, DepthwiseConv
from rtdm_tpu.ops.convpool import conv2d


class _SplitFusedConv1x1(nn.Module):
    """Param-compatible stand-in for ``Conv(features, kernel_size=1)`` over
    a 3-way channel concat: same ``kernel`` (1,1,3C,F) / ``bias`` (F,)
    params, applied as three per-branch 1x1 convs summed.

    Algebraically identical (W @ concat(b1,b2,b3) == sum_i W_i @ b_i up to
    f32 accumulation order), but the 3C concat buffer never materializes:
    on the bandwidth-bound classifier the concat is ~17% of the program's
    measured HBM bytes/frame (BENCH r03: 5.10 MB/frame total), so eliding
    it is a direct roofline win. Checkpoints load unchanged."""
    features: int

    @nn.compact
    def __call__(self, branches) -> jax.Array:
        c = branches[0].shape[-1]
        n = len(branches)
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (1, 1, n * c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.astype(branches[0].dtype)
        out = None
        for i, b in enumerate(branches):
            y = conv2d(b, k[:, :, i * c:(i + 1) * c, :])
            out = y if out is None else out + y
        return out + bias.astype(out.dtype)


class ACFF(nn.Module):
    out_channels: int
    dropout_rate: float = 0.2
    bn_axis: Optional[str] = None  # set to mesh axis name for sync-BN
    split_fuse: bool = False  # elide the concat (see _SplitFusedConv1x1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b1 = DepthwiseConv(3, 1, padding=0, dilation=1, name="conv1")(x)
        b2 = DepthwiseConv(3, 1, padding=1, dilation=2, name="conv2")(x)
        b3 = DepthwiseConv(3, 1, padding=2, dilation=3, name="conv3")(x)
        if self.split_fuse:
            out = _SplitFusedConv1x1(self.out_channels,
                                     name="fused_conv")([b1, b2, b3])
        else:
            out = jnp.concatenate([b1, b2, b3], axis=-1)
            out = Conv(self.out_channels, kernel_size=1,
                       name="fused_conv")(out)
        # Parity quirk: activation BEFORE batch-norm (acff.py:52-53).
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = BatchNorm(axis_name=self.bn_axis, name="batch_norm")(out, train)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        return out
