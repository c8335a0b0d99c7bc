"""Batch-in-channels packed inference for the ErNET classifier family.

Why this exists (TPU layout, not model semantics): the classifiers carry
tiny channel counts (conv1 C=16, ACFF branches C=16..128 — reference
topology code/disaster_detection/model/squeeze_ernet.py:10-22), and on a
v5e the vector lanes and HBM tiling are 128-wide in the minor dimension.
NHWC puts C minor, so a C=16 stage fills 12.5% of a lane register/tile.
The measured consequence is the headline engine running at ~61% of the
HBM nameplate (BENCH_r03, DESIGN.md roofline rows) with fusion headroom
already ruled out by measurement (split-fuse probe).

The packing trick: fold k=8 images into the channel dimension —
``[N,H,W,C] -> [N/k,H,W,k*C]`` — so every stage's channel count becomes a
multiple of 128 (16->128, 3*16->384, 64->512, 96->768, 128->1024,
256->2048). Convs become grouped convs (``feature_group_count=k`` for
pointwise, ``k*C`` for depthwise), pools/activations are untouched, and
weights/BN stats tile k-fold (170k params — replication is free). The
arithmetic is identical per image: group j of every grouped conv sees
exactly image j's channels, so this is a pure layout transform, bit-equal
in f32 up to XLA scheduling.

This is an inference/engine fast path: eval-mode only (BN running stats,
dropout off), functional (no flax module), driven by the SAME variables
pytree as models/ernet.py — checkpoints need no conversion.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rtdm_tpu.data.aider import normalize_batch
from rtdm_tpu.ops.convpool import avg_pool2d, conv2d, max_pool2d

# (acff channel plan, head pool padding) per model — mirrors models/ernet.py
_PLANS = {
    "squeeze-ernet": (("acff1", "acff2", "acff3", "acff4"), 1),
    "ernet": (("acff1", "acff2", "acff3", "acff4", "acff5", "acff6"), 0),
}
_POOL_AFTER = {  # max_pool2d(2,2) follows these stages (ernet.py shape flow)
    "squeeze-ernet": ("acff1", "acff2", "acff3"),
    "ernet": ("acff1", "acff2", "acff3"),
}


def _tile_o(w: jax.Array, k: int) -> jax.Array:
    """Tile the trailing (output-channel) axis k times: [..., O] -> [..., kO].

    Grouped-conv channel order is [group][feature]; tiling the O axis makes
    group j apply the same per-image filter, which is exactly the packed
    semantics (image j lives in channel group j)."""
    return jnp.tile(w, (1,) * (w.ndim - 1) + (k,))


def _block_diag_kernel(w: jax.Array, k: int,
                       in_order: str = "kc") -> jax.Array:
    """Expand an HWIO kernel [kh,kw,I,O] to the dense packed kernel
    [kh,kw,k*I,k*O] that applies W independently per image group.

    The measured failure of the grouped-conv path (roofline probe: every
    grouped 1x1 needs its input channels re-ordered to [image][feature],
    and that interleave materializes ~2 MB/frame) motivates this variant:
    keep the activations in whatever channel order falls out of the
    previous op and absorb the permutation into a block-diagonal weight —
    MACs go up k-fold, but at 5% MFU the MXU is idle and weights are read
    once per batch, so FLOPs are the cheap currency.

    in_order: 'kc' when input channels are ordered [image][feature] (the
    pack layout), 'ck' when ordered [feature][image]."""
    kh, kw, i, o = w.shape
    eye = jnp.eye(k, dtype=w.dtype)
    if in_order == "kc":
        # out channel j*O+f reads in channel j*I+c
        dense = jnp.einsum("hwio,jk->hwjiko", w, eye)
    else:
        dense = jnp.einsum("hwio,jk->hwijko", w, eye)
    return dense.reshape(kh, kw, k * i, k * o)


def pack_images(x: jax.Array, k: int) -> jax.Array:
    """[N,H,W,C] -> [N/k, H, W, k*C]; image j of block b -> channel group j."""
    n, h, w, c = x.shape
    assert n % k == 0, f"batch {n} not divisible by pack factor {k}"
    x = x.reshape(n // k, k, h, w, c)
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(n // k, h, w, k * c)


def _packed_acff(x: jax.Array, p, s, k: int, layout: str = "grouped",
                 eps: float = 1e-5) -> jax.Array:
    """ACFF block (models/acff.py) on a [B,H,W,k*C] packed activation."""
    c = x.shape[-1] // k
    branches = []
    for i, dil in ((1, 1), (2, 2), (3, 3)):
        dw = p[f"conv{i}"]
        # depthwise: kernel [3,3,1,C] -> [3,3,1,kC], fgc = kC
        y = conv2d(x, _tile_o(dw["kernel"].astype(x.dtype), k),
                   jnp.tile(dw["bias"], k), stride=1, padding=dil - 1,
                   dilation=dil, groups=k * c)
        branches.append(y)
    b, h, w = branches[0].shape[:3]
    fc = p["fused_conv"]
    if layout == "dense":
        # plain branch-major concat [3][k][C] — no interleave; the image
        # permutation lives in the block-diagonal kernel instead
        cat = jnp.concatenate(branches, axis=-1)
        w3 = fc["kernel"].astype(x.dtype).reshape(3, c, -1)
        eye = jnp.eye(k, dtype=x.dtype)
        dense = jnp.einsum("icf,jl->ijclf", w3, eye).reshape(
            1, 1, 3 * k * c, k * w3.shape[-1])
        out = conv2d(cat, dense, jnp.tile(fc["bias"], k))
    else:
        # concat per image: [kC]x3 -> [k,C]x3 -> [k,3C] -> [k*3C]
        cat = jnp.concatenate([y.reshape(b, h, w, k, c) for y in branches],
                              axis=-1).reshape(b, h, w, k * 3 * c)
        out = conv2d(cat, _tile_o(fc["kernel"].astype(x.dtype), k),
                     jnp.tile(fc["bias"], k), groups=k)
    out = jax.nn.leaky_relu(out, negative_slope=0.01)
    bn, bs = p["batch_norm"], s["batch_norm"]
    inv = jax.lax.rsqrt(bs["var"] + eps) * bn["scale"]
    out = ((out.astype(jnp.float32) - jnp.tile(bs["mean"], k))
           * jnp.tile(inv, k) + jnp.tile(bn["bias"], k))
    return out.astype(x.dtype)


def packed_forward(variables, images_u8: jax.Array, k: int = 8,
                   model: str = "squeeze-ernet",
                   layout: str = "grouped",
                   compute_dtype=jnp.bfloat16) -> jax.Array:
    """Eval-mode forward, u8 NHWC -> class probabilities [N, num_classes].

    Numerically matches ``create_model(model).apply(variables, x,
    train=False)`` image-for-image (tested in tests/test_packed.py); only
    the on-chip layout differs. ``k=8`` makes every stage's packed channel
    count a multiple of 128 on the ErNET family.

    layout='grouped': pointwise convs as feature_group_count=k grouped
    convs (needs a per-image channel interleave before each fuse conv).
    layout='dense': pointwise convs as plain dense convs over
    block-diagonal kernels (k-fold MACs, no interleave) — see
    _block_diag_kernel for the measured rationale.
    """
    if model not in _PLANS:
        raise ValueError(f"packed_forward supports {sorted(_PLANS)}, "
                         f"not '{model}' (redconv has no 128-aligned plan)")
    stages, head_pad = _PLANS[model]
    params, stats = variables["params"], variables["batch_stats"]
    dense = layout == "dense"

    x = normalize_batch(images_u8).astype(compute_dtype)
    x = pack_images(x, k)  # [B,140,140,k*3]
    k1 = params["conv1"]["kernel"].astype(x.dtype)
    if dense:
        x = conv2d(x, _block_diag_kernel(k1, k), stride=2)
    else:
        # conv1 3x3 s2: fgc=k, kernel [3,3,3,16] -> [3,3,3,k*16]
        x = conv2d(x, _tile_o(k1, k), stride=2, groups=k)
    pools = _POOL_AFTER[model]
    for name in stages:
        x = _packed_acff(x, params[name], stats[name], k, layout)
        if name in pools:
            x = max_pool2d(x, 2, 2)
    # head: 1x1 conv (no bias) -> odd avg-pool -> NCHW flatten -> fc
    head = params["head"]
    k2 = head["conv2"]["kernel"].astype(x.dtype)
    if dense:
        x = conv2d(x, _block_diag_kernel(k2, k))
    else:
        x = conv2d(x, _tile_o(k2, k), groups=k)
    x = avg_pool2d(x, 5, 1, head_pad, count_include_pad=True)
    b, h, w, kc = x.shape
    nc = kc // k
    # unpack: [B,H,W,k,nc] -> per-image torch (C,H,W) order -> [N, nc*h*w]
    x = jnp.transpose(x.reshape(b, h, w, k, nc), (0, 3, 4, 1, 2))
    x = x.reshape(b * k, nc * h * w)
    fc = head["fc"]
    x = jnp.dot(x, fc["kernel"].astype(x.dtype)) + fc["bias"].astype(x.dtype)
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


def packed_engine_fn(variables, k: int = 8, model: str = "squeeze-ernet",
                     layout: str = "grouped", compute_dtype=jnp.bfloat16):
    """Jit-ready closure over cast weights, mirroring export/engine.py's
    weights-as-constants style: ``fn(images_u8) -> probs``."""
    return partial(packed_forward, variables, k=k, model=model,
                   layout=layout, compute_dtype=compute_dtype)
