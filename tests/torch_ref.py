"""Torch-functional ground-truth executors for parity tests.

These drive `torch.nn.functional` directly from a loaded reference
state_dict (NCHW), giving tests an independent oracle for what the
reference models compute — without importing any reference code.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, key):
    v = sd[key]
    return torch.from_numpy(np.asarray(v)) if isinstance(v, np.ndarray) else v


def acff_forward(x: torch.Tensor, sd, prefix: str) -> torch.Tensor:
    c = x.shape[1]
    branches = []
    for i, (pad, dil) in enumerate([(0, 1), (1, 2), (2, 3)], start=1):
        branches.append(F.conv2d(x, _t(sd, f"{prefix}conv{i}.weight"),
                                 _t(sd, f"{prefix}conv{i}.bias"),
                                 stride=1, padding=pad, dilation=dil, groups=c))
    out = torch.cat(branches, dim=1)
    out = F.conv2d(out, _t(sd, f"{prefix}fused_conv.weight"),
                   _t(sd, f"{prefix}fused_conv.bias"))
    out = F.leaky_relu(out, 0.01)
    out = F.batch_norm(out, _t(sd, f"{prefix}batch_norm.running_mean"),
                       _t(sd, f"{prefix}batch_norm.running_var"),
                       _t(sd, f"{prefix}batch_norm.weight"),
                       _t(sd, f"{prefix}batch_norm.bias"),
                       training=False, eps=1e-5)
    return out  # dropout is identity in eval


def head_forward(x: torch.Tensor, sd, pool_padding: int) -> torch.Tensor:
    x = F.conv2d(x, _t(sd, "conv2.weight"))
    x = F.avg_pool2d(x, 5, stride=1, padding=pool_padding,
                     count_include_pad=True)
    x = x.reshape(x.shape[0], -1)
    x = F.linear(x, _t(sd, "fc.weight"), _t(sd, "fc.bias"))
    return torch.softmax(x, dim=1)


def squeeze_ernet_forward(x: torch.Tensor, sd) -> torch.Tensor:
    x = F.conv2d(x, _t(sd, "conv1.weight"), stride=2)
    x = acff_forward(x, sd, "acff1.")
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff2.")
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff3.")
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff4.")
    return head_forward(x, sd, pool_padding=1)


def squeeze_redconv_forward(x: torch.Tensor, sd) -> torch.Tensor:
    x = F.conv2d(x, _t(sd, "conv1.weight"), stride=2)
    x = F.conv2d(x, _t(sd, "conv_red1.weight"), _t(sd, "conv_red1.bias"))
    x = acff_forward(x, sd, "acff1.")
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff2.")
    x = F.conv2d(x, _t(sd, "conv_red2.weight"), _t(sd, "conv_red2.bias"))
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff3.")
    x = F.max_pool2d(x, 2, 2)
    x = F.conv2d(x, _t(sd, "conv_red3.weight"), _t(sd, "conv_red3.bias"))
    x = acff_forward(x, sd, "acff4.")
    return head_forward(x, sd, pool_padding=1)


def ernet_forward(x: torch.Tensor, sd) -> torch.Tensor:
    x = F.conv2d(x, _t(sd, "conv1.weight"), stride=2)
    x = acff_forward(x, sd, "acff1.")
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff2.")
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff3.")
    x = F.max_pool2d(x, 2, 2)
    x = acff_forward(x, sd, "acff4.")
    x = acff_forward(x, sd, "acff5.")
    x = acff_forward(x, sd, "acff6.")
    return head_forward(x, sd, pool_padding=0)
