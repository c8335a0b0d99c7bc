"""Conv+BN folding for inference.

Parity with `fuse_conv_and_bn` (yolov3/utils/torch_utils.py:52,
yolov5/utils/torch_utils.py:188, used by Darknet.fuse() models.py:397-412):
fold BatchNorm's inference affine into the preceding conv's kernel/bias so
the compiled graph loses one elementwise stage per conv. XLA usually fuses
BN into the conv epilogue anyway; folding still shrinks the HLO and makes
exported engines self-contained.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def fuse_conv_bn(kernel: np.ndarray, bias, bn_scale, bn_bias, bn_mean,
                 bn_var, eps: float) -> Tuple[np.ndarray, np.ndarray]:
    """kernel HWIO; returns (fused_kernel, fused_bias)."""
    scale = np.asarray(bn_scale) / np.sqrt(np.asarray(bn_var) + eps)
    fused_kernel = np.asarray(kernel) * scale  # broadcast over O (last axis)
    b = np.zeros(kernel.shape[-1], np.float32) if bias is None \
        else np.asarray(bias)
    fused_bias = (b - np.asarray(bn_mean)) * scale + np.asarray(bn_bias)
    return fused_kernel.astype(np.float32), fused_bias.astype(np.float32)


def strip_bn_from_cfg(cfg_text: str) -> str:
    """cfg text for the fused graph: drop every batch_normalize line so
    convs are built WITH bias and WITHOUT BatchNorm modules — the module
    tree `fuse_darknet_variables` produces."""
    import re

    return "\n".join(ln for ln in cfg_text.splitlines()
                     if not re.match(r"\s*batch_normalize\s*=", ln))


def fuse_darknet_variables(variables: Dict[str, Any], cfg_text: str
                           ) -> Dict[str, Any]:
    """Darknet.fuse() analogue: returns variables where every
    batch-normalized conv has BN folded in (batch_stats emptied for those
    layers). The fused tree no longer matches the unfused module; use with
    a cfg whose convs are built WITHOUT batch_normalize, or simply for
    exporting weights. Eps matches our darknet BN (1e-4)."""
    import copy

    from rtdm_tpu.models.darknet import parse_darknet_cfg

    variables = copy.deepcopy(variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    defs = parse_darknet_cfg(cfg_text)[1:]
    for i, d in enumerate(defs):
        if d["type"] != "convolutional" or not d.get("batch_normalize", 0):
            continue
        conv = params[f"l{i}_conv"]
        bn = params.pop(f"l{i}_bn")
        st = stats.pop(f"l{i}_bn")
        k, b = fuse_conv_bn(conv["kernel"], conv.get("bias"),
                            bn["scale"], bn["bias"], st["mean"], st["var"],
                            eps=1e-4)
        conv["kernel"], conv["bias"] = k, b
    return variables
