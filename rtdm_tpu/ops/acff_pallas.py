"""Fused ACFF Pallas kernel for TPU.

Replaces the ACFF block's 5-op chain (3 dilated depthwise convs -> concat
-> 1x1 conv -> LeakyReLU -> BN affine; models/acff.py) with ONE kernel:

- the input tile is loaded to VMEM once and all three dilated branches read
  it as shifted slices (9 multiply-accumulates each on the VPU) — no HBM
  round trip for branch outputs or the 3C concat;
- the 1x1 fuse conv becomes a single (P, 3C) x (3C, O) matmul on the MXU
  over the tile's pixels, with bias + LeakyReLU(0.01) + folded BN affine
  applied in the epilogue (inference BN: scale' = gamma*rsqrt(var+eps),
  shift' = beta - mean*scale');
- grid = batch tiles; each step holds (TB, H, W, C) input and emits
  (TB, H-2, W-2, O). All ErNET-family ACFF inputs fit VMEM comfortably
  (max 69x69x16 / 33x33x64 / 15x15x96 / 6x6x128).

Numerics match ops-based ACFF at fp32 to ~1e-5 (unit-tested, including
via interpret mode on CPU). `fused_acff_infer` is inference-only (BN uses
running stats; dropout is identity).

MEASURED (TPU v5e, Squeeze_ErNET fp32, batch 1024, 2026-08): the fused
path is numerically exact (max diff 2.4e-6) but ~2.7x SLOWER than plain
XLA (27.7k vs 75.3k FPS): at these tiny spatial extents (<=33x33) and
channel counts XLA's automatic fusion already keeps everything in VMEM and
its conv tiling beats this kernel's small batch tiles (VMEM limits cap
tb<=3 at the 33x33x64 block). Default inference therefore stays on the
XLA path; this kernel remains available (`fused_classifier_forward`) and
becomes interesting for larger frames where XLA would spill the concat.
C<32 blocks always use XLA (Mosaic compile blow-up at lane padding 16).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _acff_kernel(x_ref, dw_w_ref, dw_b_ref, fuse_w_ref, fuse_b_ref,
                 scale_ref, shift_ref, out_ref):
    """One batch tile.

    x: (TB, H, W, C); dw_w: (3, 3, 3, C) [branch, kh, kw, C];
    dw_b: (3, C); fuse_w: (3C, O); fuse_b/scale/shift: (O,).
    out: (TB, H-2, W-2, O).
    """
    x = x_ref[...].astype(jnp.float32)
    tb, h, w, c = x.shape
    oh, ow = h - 2, w - 2

    # branch taps: (dilation d, padding d-1) -> for output pixel (i, j),
    # input rows i + (d-1) + (k-1)*d for k in 0..2 mapped into the padded
    # frame; expressed as static slices of the unpadded input with edge
    # handling via zero-padded copies for d=2,3.
    def branch(d):
        pad = d - 1
        if pad:
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        else:
            xp = x
        acc = jnp.zeros((tb, oh, ow, c), jnp.float32)
        for kh in range(3):
            for kw in range(3):
                tap = xp[:, kh * d: kh * d + oh, kw * d: kw * d + ow, :]
                wgt = dw_w_ref[d - 1, kh, kw, :].astype(jnp.float32)
                acc = acc + tap * wgt
        return acc + dw_b_ref[d - 1].astype(jnp.float32)

    b1 = branch(1)
    b2 = branch(2)
    b3 = branch(3)
    cat = jnp.concatenate([b1, b2, b3], axis=-1)        # (TB, oh, ow, 3C)
    flat = cat.reshape(tb * oh * ow, 3 * c)
    fused = jnp.dot(flat, fuse_w_ref[...].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    fused = fused + fuse_b_ref[...].astype(jnp.float32)
    act = jnp.where(fused > 0, fused, 0.01 * fused)     # LeakyReLU(0.01)
    out = act * scale_ref[...].astype(jnp.float32) \
        + shift_ref[...].astype(jnp.float32)
    out_ref[...] = out.reshape(tb, oh, ow, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def fused_acff_infer(x: jax.Array,
                     dw_weights: jax.Array, dw_bias: jax.Array,
                     fuse_w: jax.Array, fuse_b: jax.Array,
                     bn_scale: jax.Array, bn_shift: jax.Array,
                     batch_tile: int = 8,
                     interpret: bool = False) -> jax.Array:
    """x: (B, H, W, C) NHWC. dw_weights: (3, 3, 3, C); fuse_w: (3C, O).

    bn_scale/bn_shift are the FOLDED inference affine:
    scale = gamma * rsqrt(var + eps), shift = beta - mean * scale.
    """
    b, h, w, c = x.shape
    o = fuse_w.shape[-1]
    # Auto-fit the batch tile to VMEM: the kernel holds roughly
    # x (+2 padded copies worst case), 3 branch accumulators, the 3C
    # concat and the output — all fp32.
    per_sample = 4 * (3 * h * w * c            # x + padded copies
                      + 4 * (h - 2) * (w - 2) * c   # branches + acc
                      + (h - 2) * (w - 2) * 3 * c   # concat/flat
                      + 2 * (h - 2) * (w - 2) * o)  # matmul out + write
    budget = 10 * 1024 * 1024
    tb = max(min(batch_tile, b, budget // max(per_sample, 1)), 1)
    while b % tb:
        tb -= 1
    grid = (b // tb,)

    return pl.pallas_call(
        _acff_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((3, 3, 3, c), lambda i: (0, 0, 0, 0),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((3, c), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((3 * c, o), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((o,), lambda i: (0,),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((o,), lambda i: (0,),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((o,), lambda i: (0,),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, h - 2, w - 2, o),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h - 2, w - 2, o), x.dtype),
        interpret=interpret,
    )(x, dw_weights, dw_bias, fuse_w, fuse_b, bn_scale, bn_shift)


def pack_acff_params(acff_params: dict, acff_stats: dict,
                     eps: float = 1e-5) -> Tuple[jax.Array, ...]:
    """Fold an ACFF module's variables into kernel arguments.

    acff_params: {'conv1','conv2','conv3': {kernel (3,3,1,C), bias},
    'fused_conv': {kernel (1,1,3C,O), bias}, 'batch_norm': {scale, bias}};
    acff_stats: {'batch_norm': {mean, var}}.
    """
    dw_w = jnp.stack([acff_params[f"conv{i}"]["kernel"][:, :, 0, :]
                      for i in (1, 2, 3)])            # (3, 3, 3, C)
    dw_b = jnp.stack([acff_params[f"conv{i}"]["bias"] for i in (1, 2, 3)])
    fuse_w = acff_params["fused_conv"]["kernel"][0, 0]  # (3C, O)
    fuse_b = acff_params["fused_conv"]["bias"]
    gamma = acff_params["batch_norm"]["scale"]
    beta = acff_params["batch_norm"]["bias"]
    mean = acff_stats["batch_norm"]["mean"]
    var = acff_stats["batch_norm"]["var"]
    scale = gamma * jax.lax.rsqrt(var + eps)
    shift = beta - mean * scale
    return dw_w, dw_b, fuse_w, fuse_b, scale, shift


def fused_classifier_forward(model, variables, fused_batch_tile: int = 8,
                             interpret: bool = False):
    """Build an inference forward for the ErNET family that runs every
    ACFF block through the fused kernel (non-ACFF layers stay XLA ops).

    Returns forward(x_normalized) -> probs.
    """
    from rtdm_tpu.models.ernet import (ErNET, SqueezeErNET, SqueezeRedConv,
                                       _nchw_flatten)
    from rtdm_tpu.ops.convpool import avg_pool2d, conv2d, max_pool2d

    params = variables["params"]
    stats = variables["batch_stats"]

    def acff(name, x):
        if x.shape[-1] < 32 and not interpret:
            # tiny channel counts (ACFF1's C=16) hit a Mosaic compile
            # blow-up (lane padding 16->128 over 27 shifted windows);
            # XLA handles that block well — keep it on the ops path.
            from rtdm_tpu.models.acff import ACFF
            out_ch = params[name]["fused_conv"]["kernel"].shape[-1]
            mod = ACFF(out_ch)
            return mod.apply({"params": params[name],
                              "batch_stats": stats[name]}, x, train=False)
        args = pack_acff_params(params[name], stats[name])
        return fused_acff_infer(x, *args, batch_tile=fused_batch_tile,
                                interpret=interpret)

    def conv(name, x, stride=1):
        p = params[name]
        return conv2d(x, p["kernel"], p.get("bias"), stride=stride)

    def head(x):
        hp = params["head"]
        x = conv2d(x, hp["conv2"]["kernel"])
        x = avg_pool2d(x, 5, 1, 1 if isinstance(model, (SqueezeErNET,
                                                        SqueezeRedConv))
                       else 0, count_include_pad=True)
        x = _nchw_flatten(x)
        x = x @ hp["fc"]["kernel"] + hp["fc"]["bias"]
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)

    if isinstance(model, SqueezeErNET):
        def forward(x):
            x = conv("conv1", x, 2)
            x = acff("acff1", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff2", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff3", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff4", x)
            return head(x)
    elif isinstance(model, SqueezeRedConv):
        def forward(x):
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
            return head(x)
    elif isinstance(model, ErNET):
        def forward(x):
            x = conv("conv1", x, 2)
            x = acff("acff1", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff2", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff3", x)
            x = max_pool2d(x, 2, 2)
            x = acff("acff4", x)
            x = acff("acff5", x)
            x = acff("acff6", x)
            return head(x)
    else:
        raise TypeError(f"unsupported model {type(model)}")
    return forward
