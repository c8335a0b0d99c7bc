"""Darknet-cfg model DSL -> TPU-native JAX graph.

Re-implements the *format and semantics* of the reference's cfg-driven
detector builder (yolov3/utils/parse_config.py:6-52 for the DSL,
yolov3/models.py:9-123 for module semantics) as an NHWC flax module:

- convolutional: conv(pad=k//2 if pad) + BN(momentum 0.003, eps 1e-4,
  sync across the data axis — models.py:36 uses SyncBatchNorm
  unconditionally) + activation (leaky 0.1 / swish / mish / linear).
- acff: the *detector* ACFF variant — 3 dilated depthwise convs fused
  ADDITIVELY (models.py:302: conv1+conv2+conv3, unlike the classifier's
  concat), 1x1 fuse (in->out), LeakyReLU(0.01) BEFORE BatchNorm, dropout.
- maxpool: pad (k-1)//2; the yolov3-tiny size2/stride1 case pads
  asymmetrically (0,1,0,1) (models.py:61-63).
- upsample: integer nearest-neighbour.
- route: channel concat of cached layer outputs, with nearest-resize
  fallback on spatial mismatch (models.py:369-378).
- shortcut: weightedFeatureFusion — (optionally sigmoid-weighted) sum with
  channel slicing on mismatch (models.py:126-155).
- yolo: heads return RAW NHWC maps + (anchors, stride) metadata; decoding
  is a separate vectorized XLA op (ops/yolo.py) so inference fuses
  decode+NMS into the same program — the TPU analogue of the reference's
  CUDA YoloLayer plugin (tensorrt_inference/plugins/yolo_layer.cu).

Weight import: darknet binary (.weights, layout per models.py:439-487) and
the fork's torch checkpoints (module_list.{i}.* state_dicts).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rtdm_tpu.models.layers import BatchNorm, Conv, DepthwiseConv
from rtdm_tpu.ops.convpool import max_pool2d

# ---------------------------------------------------------------------------
# cfg parsing


def parse_darknet_cfg(text_or_path: str) -> List[Dict[str, Any]]:
    """Parse darknet .cfg text into a list of block dicts (first is [net])."""
    if "\n" not in text_or_path:
        with open(text_or_path) as f:
            text = f.read()
    else:
        text = text_or_path
    blocks: List[Dict[str, Any]] = []
    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        if line.startswith("["):
            blocks.append({"type": line.strip("[]").strip()})
        else:
            if "=" not in line or not blocks:
                continue
            key, val = (s.strip() for s in line.split("=", 1))
            blocks[-1][key] = _parse_value(key, val)
    return blocks


def _parse_value(key: str, val: str):
    if key in ("layers", "mask", "from"):
        return tuple(int(v) for v in val.split(","))
    if key == "anchors":
        nums = [float(v) for v in val.replace(" ", "").split(",") if v]
        return tuple((nums[i], nums[i + 1]) for i in range(0, len(nums), 2))
    if key in ("steps", "scales"):
        return tuple(float(v) for v in val.split(","))
    try:
        f = float(val)
        return int(f) if f.is_integer() and "." not in val else f
    except ValueError:
        return val


# ---------------------------------------------------------------------------
# activations


def _activation(name: str):
    if name == "leaky":
        return lambda x: nn.leaky_relu(x, 0.1)
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "mish":
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    if name == "relu":
        return jax.nn.relu
    if name in ("hardswish", "hard_swish"):
        return jax.nn.hard_swish
    if name == "relu6":
        return lambda x: jnp.clip(x, 0, 6)
    if name in ("linear", "logistic"):
        return (jax.nn.sigmoid if name == "logistic" else (lambda x: x))
    raise ValueError(f"unsupported activation '{name}'")


# parametric activations (yolov5/utils/activations.py FReLU/AconC/
# MetaAconC) — these carry parameters, so they are linen modules
# instantiated inside the conv block rather than pure functions
PARAMETRIC_ACTIVATIONS = ("frelu", "aconc", "meta_aconc")


def _parametric_activation(name: str, layer_name: str, bn_axis):
    from rtdm_tpu.models.layers import AconC, FReLU, MetaAconC

    if name == "frelu":
        return FReLU(bn_axis=bn_axis, name=layer_name)
    if name == "aconc":
        return AconC(name=layer_name)
    return MetaAconC(name=layer_name)


# ---------------------------------------------------------------------------
# the model


class YoloHead:
    """Static metadata for one [yolo] block."""

    def __init__(self, anchors_px: np.ndarray, num_classes: int,
                 layer_index: int, scale_x_y: float = 1.0,
                 new_coords: bool = False, v5: bool = False):
        self.anchors_px = np.asarray(anchors_px, np.float32)  # (na, 2)
        self.num_classes = int(num_classes)
        self.layer_index = int(layer_index)
        self.scale_x_y = float(scale_x_y)
        self.new_coords = bool(new_coords)
        self.v5 = bool(v5)  # ultralytics decode (yolov5/models/yolo.py:58-62)

    @property
    def na(self) -> int:
        return self.anchors_px.shape[0]

    @property
    def no(self) -> int:
        return self.num_classes + 5


class Darknet(nn.Module):
    """cfg-driven detector. `__call__` returns a list of raw NHWC head maps
    (one per [yolo] block, channels = na*(5+nc)); pair with `self.heads`
    metadata for decode/loss."""

    cfg_text: str
    bn_axis: Optional[str] = None
    dropout_rate: float = 0.2

    def setup(self):
        blocks = parse_darknet_cfg(self.cfg_text)
        self.net_info = blocks[0]
        self.defs = tuple(blocks[1:])
        heads = []
        for i, d in enumerate(self.defs):
            if d["type"] == "yolo":
                anchors = np.array(d["anchors"], np.float32)[list(d["mask"])]
                heads.append(YoloHead(
                    anchors, d.get("classes", 80), i,
                    scale_x_y=float(d.get("scale_x_y", 1.0)),
                    new_coords=bool(d.get("new_coords", 0))))
        self.heads = tuple(heads)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        defs = self.defs  # parsed once in setup(); one interpretation site
        outputs: List[Optional[jax.Array]] = []
        needed = _route_targets(defs)
        yolo_raw: List[jax.Array] = []

        for i, d in enumerate(defs):
            t = d["type"]
            if t == "convolutional":
                k = int(d.get("size", 1))
                stride = int(d.get("stride", 1))
                pad = (k - 1) // 2 if d.get("pad", 0) else 0
                bn = bool(d.get("batch_normalize", 0))
                # grouped conv (models.py:33 passes mdef['groups']); the
                # .weights loader needs no change — counts follow the
                # (kh,kw,cin/g,cout) kernel shape
                x = Conv(int(d["filters"]), k, stride, pad,
                         groups=int(d.get("groups", 1)),
                         use_bias=not bn, name=f"l{i}_conv")(x)
                if bn:
                    x = BatchNorm(momentum=0.003, epsilon=1e-4,
                                  axis_name=self.bn_axis,
                                  name=f"l{i}_bn")(x, train)
                act = d.get("activation", "linear")
                if act in PARAMETRIC_ACTIVATIONS:
                    x = _parametric_activation(
                        act, f"l{i}_act", self.bn_axis)(x, train)
                else:
                    x = _activation(act)(x)
            elif t == "acff":
                x = self._acff(i, x, int(d["filters"]),
                               int(d.get("size", 3)), train)
            elif t == "maxpool":
                k, s = int(d["size"]), int(d["stride"])
                if k == 2 and s == 1:  # yolov3-tiny same-size pool:
                    # reference pads ZEROS bottom/right (nn.ZeroPad2d
                    # ((0,1,0,1)), models.py:62-63), so a post-leaky
                    # negative border maxes against 0, not -inf
                    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                                constant_values=0.0)
                    x = max_pool2d(x, 2, 1)
                else:
                    x = max_pool2d(x, k, s, (k - 1) // 2)
            elif t == "upsample":
                s = int(d["stride"])
                x = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
            elif t == "route":
                srcs = [outputs[li if li >= 0 else i + li]
                        for li in d["layers"]]
                g = int(d.get("groups", 1))
                if g > 1:
                    # darknet grouped route (the yolov4-tiny CSP split):
                    # each source contributes only its group_id-th channel
                    # slice. NOTE: the reference fork IGNORES groups and
                    # concats everything (models.py:75-77, :355-368), which
                    # misaligns true-darknet .weights for such cfgs (e.g.
                    # yolov4-tiny-3l-512x512.cfg); we implement the real
                    # darknet semantics instead.
                    gid = int(d.get("group_id", 0))
                    srcs = [s[..., (s.shape[-1] // g) * gid:
                              (s.shape[-1] // g) * (gid + 1)] for s in srcs]
                x = _concat_with_resize(srcs)
            elif t == "shortcut":
                x = self._shortcut(i, d, x, outputs)
            elif t == "yolo":
                yolo_raw.append(x)
            elif t in ("reorg3d", "dropout"):
                pass
            else:
                raise ValueError(f"unsupported block [{t}] at layer {i}")
            outputs.append(x if i in needed else None)
        return yolo_raw

    def _acff(self, i: int, x: jax.Array, filters: int, k: int,
              train: bool) -> jax.Array:
        b1 = DepthwiseConv(k, 1, padding=0, dilation=1,
                           name=f"l{i}_acff_conv1")(x)
        b2 = DepthwiseConv(k, 1, padding=1, dilation=2,
                           name=f"l{i}_acff_conv2")(x)
        b3 = DepthwiseConv(k, 1, padding=2, dilation=3,
                           name=f"l{i}_acff_conv3")(x)
        out = b1 + b2 + b3  # additive fusion (models.py:302)
        out = Conv(filters, 1, name=f"l{i}_acff_fused")(out)
        out = nn.leaky_relu(out, 0.01)
        out = BatchNorm(axis_name=self.bn_axis,
                        name=f"l{i}_acff_bn")(out, train)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        return out

    def _shortcut(self, i: int, d: Dict[str, Any], x: jax.Array,
                  outputs: List[Optional[jax.Array]]) -> jax.Array:
        layers = d["from"]
        weighted = "weights_type" in d
        n = len(layers) + 1
        if weighted:
            w_raw = self.param(f"l{i}_w", nn.initializers.zeros, (n,),
                               jnp.float32)
            w = jax.nn.sigmoid(w_raw) * (2.0 / n)
            x = x * w[0]
        nc = x.shape[-1]
        for j, li in enumerate(layers):
            a = outputs[li if li >= 0 else i + li]
            if weighted:
                a = a * w[j + 1]
            ac = a.shape[-1]
            if nc == ac:
                x = x + a
            elif nc > ac:  # add into leading channels
                x = x.at[..., :ac].add(a)
            else:
                x = x + a[..., :nc]
        return x


def _route_targets(defs: Sequence[Dict[str, Any]]) -> set:
    needed = set()
    for i, d in enumerate(defs):
        for key in ("layers", "from"):
            if key in d and d["type"] in ("route", "shortcut"):
                for li in d[key]:
                    needed.add(li if li >= 0 else i + li)
    return needed


def _concat_with_resize(srcs: List[jax.Array]) -> jax.Array:
    if len(srcs) == 1:
        return srcs[0]
    hmax = max(s.shape[1] for s in srcs)
    wmax = max(s.shape[2] for s in srcs)
    fixed = []
    for s in srcs:
        if s.shape[1] != hmax or s.shape[2] != wmax:
            s = jax.image.resize(s, (s.shape[0], hmax, wmax, s.shape[3]),
                                 method="nearest")
        fixed.append(s)
    return jnp.concatenate(fixed, axis=-1)


# ---------------------------------------------------------------------------
# construction + weight import


def load_cfg_text(path: str) -> str:
    with open(path) as f:
        return f.read()


def create_darknet(cfg_path: str, **kwargs) -> Darknet:
    return Darknet(cfg_text=load_cfg_text(cfg_path), **kwargs)


def init_darknet(model: Darknet, img_size: int = 416,
                 seed: int = 0) -> Dict[str, Any]:
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    return model.init(jax.random.key(seed), x)


def load_darknet_weights(variables: Dict[str, Any], cfg_text: str,
                         weights_path: str) -> Dict[str, Any]:
    """Fill `variables` from a darknet .weights binary.

    Layout (models.py:450-487): int32[3] version, int64 seen, then per
    batch-normalized conv: [bn_bias, bn_scale, bn_mean, bn_var, conv_OIHW];
    per plain conv: [conv_bias, conv_OIHW]. acff blocks are this fork's
    torch-side extension and never appear in darknet binaries.
    """
    import copy

    blocks = parse_darknet_cfg(cfg_text)
    defs = blocks[1:]
    with open(weights_path, "rb") as f:
        np.fromfile(f, dtype=np.int32, count=3)
        np.fromfile(f, dtype=np.int64, count=1)
        w = np.fromfile(f, dtype=np.float32)

    variables = copy.deepcopy(jax.device_get(variables))
    params = variables["params"]
    stats = variables.setdefault("batch_stats", {})
    ptr = 0

    def take(n):
        nonlocal ptr
        out = w[ptr:ptr + n]
        ptr += n
        return out

    for i, d in enumerate(defs):
        if d["type"] != "convolutional":
            continue
        name = f"l{i}_conv"
        kernel = params[name]["kernel"]  # HWIO
        kh, kw, cin, cout = kernel.shape
        if d.get("batch_normalize", 0):
            bn = params[f"l{i}_bn"]
            bn["bias"] = take(cout).copy()
            bn["scale"] = take(cout).copy()
            st = stats.setdefault(f"l{i}_bn", {})
            st["mean"] = take(cout).copy()
            st["var"] = take(cout).copy()
        else:
            params[name]["bias"] = take(cout).copy()
        oihw = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
        params[name]["kernel"] = np.transpose(oihw, (2, 3, 1, 0)).copy()
    if ptr != len(w):
        raise ValueError(f"weights file size mismatch: used {ptr} of {len(w)}")
    return variables


def save_darknet_weights(variables: Dict[str, Any], cfg_text: str,
                         weights_path: str) -> None:
    """Export to darknet .weights (the pth_to_weights.py analogue)."""
    blocks = parse_darknet_cfg(cfg_text)
    defs = blocks[1:]
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    chunks = [np.array([0, 2, 5], np.int32).tobytes(),
              np.array([0], np.int64).tobytes()]
    for i, d in enumerate(defs):
        if d["type"] != "convolutional":
            continue
        kernel = np.asarray(params[f"l{i}_conv"]["kernel"], np.float32)
        if d.get("batch_normalize", 0):
            bn, st = params[f"l{i}_bn"], stats[f"l{i}_bn"]
            for arr in (bn["bias"], bn["scale"], st["mean"], st["var"]):
                chunks.append(np.asarray(arr, np.float32).tobytes())
        else:
            chunks.append(np.asarray(params[f"l{i}_conv"]["bias"],
                                     np.float32).tobytes())
        chunks.append(np.ascontiguousarray(
            np.transpose(kernel, (3, 2, 0, 1))).astype(np.float32).tobytes())
    with open(weights_path, "wb") as f:
        f.writelines(chunks)


def load_darknet_torch_checkpoint(variables: Dict[str, Any], cfg_text: str,
                                  path: str) -> Dict[str, Any]:
    """Import the fork's torch checkpoints ({'model': state_dict} with keys
    module_list.{i}.<Conv2d|BatchNorm2d|acff_{i}.*>.*, yolov3/train.py:352)."""
    import copy

    from rtdm_tpu.models.torch_import import load_torch_state_dict

    sd = load_torch_state_dict(path)
    # tolerate {'model': ...} checkpoints
    if not any(k.startswith("module_list") for k in sd):
        raise ValueError(f"not a darknet-fork checkpoint: {path}")

    variables = copy.deepcopy(jax.device_get(variables))
    params, stats = variables["params"], variables.setdefault("batch_stats", {})

    def conv_kernel(wt):
        return np.transpose(wt, (2, 3, 1, 0)).astype(np.float32)

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] != "module_list" or val.ndim == 0:
            continue
        i = int(parts[1])
        sub, leaf = parts[2], parts[-1]
        if sub == "w":
            # weightedFeatureFusion layer weights (models.py:126-138,
            # parameter `self.w` -> key module_list.{i}.w)
            params[f"l{i}_w"] = val.astype(np.float32)
        elif sub == "Conv2d":
            tgt = params[f"l{i}_conv"]
            if leaf == "weight":
                tgt["kernel"] = conv_kernel(val)
            else:
                tgt["bias"] = val.astype(np.float32)
        elif sub == "BatchNorm2d":
            if leaf == "weight":
                params[f"l{i}_bn"]["scale"] = val.astype(np.float32)
            elif leaf == "bias":
                params[f"l{i}_bn"]["bias"] = val.astype(np.float32)
            elif leaf == "running_mean":
                stats.setdefault(f"l{i}_bn", {})["mean"] = val.astype(np.float32)
            elif leaf == "running_var":
                stats.setdefault(f"l{i}_bn", {})["var"] = val.astype(np.float32)
        elif sub.startswith("acff"):
            mod = parts[3]  # conv1|conv2|conv3|fused_conv|batch_norm
            if mod in ("conv1", "conv2", "conv3"):
                tgt = params[f"l{i}_acff_{mod}"]
                if leaf == "weight":
                    tgt["kernel"] = conv_kernel(val)
                else:
                    tgt["bias"] = val.astype(np.float32)
            elif mod == "fused_conv":
                tgt = params[f"l{i}_acff_fused"]
                if leaf == "weight":
                    tgt["kernel"] = conv_kernel(val)
                else:
                    tgt["bias"] = val.astype(np.float32)
            elif mod == "batch_norm":
                if leaf == "weight":
                    params[f"l{i}_acff_bn"]["scale"] = val.astype(np.float32)
                elif leaf == "bias":
                    params[f"l{i}_acff_bn"]["bias"] = val.astype(np.float32)
                elif leaf == "running_mean":
                    stats.setdefault(f"l{i}_acff_bn", {})["mean"] = \
                        val.astype(np.float32)
                elif leaf == "running_var":
                    stats.setdefault(f"l{i}_acff_bn", {})["var"] = \
                        val.astype(np.float32)
    return variables
