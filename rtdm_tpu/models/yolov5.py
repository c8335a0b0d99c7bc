"""YOLOv5 yaml model DSL -> TPU-native JAX graph.

Re-implements the semantics of the reference's v5 fork
(yolov5/models/yolo.py:232-283 parse_model; models/common.py:33-200 block
zoo) as NHWC flax modules:

- Conv = conv(autopad, no bias) + BN(eps 1e-3, momentum 0.03 —
  torch_utils.py:151-158) + SiLU
- Focus = 2x2 space-to-depth (even-y/even-x, odd-y/even-x, even-y/odd-x,
  odd-y/odd-x channel order, common.py:169) + Conv
- Bottleneck / C3 / BottleneckCSP / SPP / DWConv / CrossConv / GhostConv /
  GhostBottleneck / Contract / Expand / Concat / nn.Upsample
- Detect = per-level 1x1 conv (WITH bias; zero at module init — fresh
  models get the focal-prior scheme, yolo.py:176-184, via
  `initialize_detect_biases`, applied by export.detector on from-scratch
  builds); raw NHWC maps returned + YoloHead metadata
  with v5 decode (xy = (2sig-0.5+grid)*stride, wh = (2sig)^2*anchor —
  yolo.py:58-62; ops/yolo.py `v5=True`).

Channel arithmetic (depth/width multiples, make_divisible 8) happens at
plan time so the graph is fully static. Parameter names mirror the torch
module tree (m{i}/cv1/conv/kernel ...) making checkpoint import mechanical.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rtdm_tpu.models.darknet import YoloHead
from rtdm_tpu.models.layers import BatchNorm, Conv as RawConv
from rtdm_tpu.ops.convpool import max_pool2d


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def autopad(k, p=None):
    if p is not None:
        return p
    if isinstance(k, (tuple, list)):
        return tuple(x // 2 for x in k)
    return k // 2


# ---------------------------------------------------------------------------
# blocks (NHWC)


class ConvBnSiLU(nn.Module):
    c2: int
    k: Any = 1
    s: Any = 1
    p: Optional[int] = None
    g: int = 1
    act: bool = True
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = RawConv(self.c2, self.k, self.s, autopad(self.k, self.p),
                    groups=self.g, use_bias=False, name="conv")(x)
        x = BatchNorm(momentum=0.03, epsilon=1e-3, axis_name=self.bn_axis,
                      name="bn")(x, train)
        return jax.nn.silu(x) if self.act else x


class Focus(nn.Module):
    c2: int
    k: int = 1
    s: int = 1
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                             x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        return ConvBnSiLU(self.c2, self.k, self.s, bn_axis=self.bn_axis,
                          name="conv")(x, train)


class Bottleneck(nn.Module):
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        c_ = int(self.c2 * self.e)
        out = ConvBnSiLU(c_, 1, bn_axis=self.bn_axis, name="cv1")(x, train)
        out = ConvBnSiLU(self.c2, 3, g=self.g, bn_axis=self.bn_axis,
                         name="cv2")(out, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + out
        return out


class C3(nn.Module):
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnSiLU(c_, 1, bn_axis=self.bn_axis, name="cv1")(x, train)
        for j in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, 1.0,
                            bn_axis=self.bn_axis, name=f"m{j}")(y1, train)
        y2 = ConvBnSiLU(c_, 1, bn_axis=self.bn_axis, name="cv2")(x, train)
        return ConvBnSiLU(self.c2, 1, bn_axis=self.bn_axis,
                          name="cv3")(jnp.concatenate([y1, y2], -1), train)


class BottleneckCSP(nn.Module):
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnSiLU(c_, 1, bn_axis=self.bn_axis, name="cv1")(x, train)
        for j in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, 1.0,
                            bn_axis=self.bn_axis, name=f"m{j}")(y1, train)
        y1 = RawConv(c_, 1, use_bias=False, name="cv3")(y1)
        y2 = RawConv(c_, 1, use_bias=False, name="cv2")(x)
        y = jnp.concatenate([y1, y2], -1)
        y = BatchNorm(momentum=0.03, epsilon=1e-3, axis_name=self.bn_axis,
                      name="bn")(y, train)
        y = nn.leaky_relu(y, 0.1)
        return ConvBnSiLU(self.c2, 1, bn_axis=self.bn_axis,
                          name="cv4")(y, train)


class TransformerLayer(nn.Module):
    """common.py:48-62: pre-projections q/k/v (no bias), 4-head attention,
    2-layer MLP, both residual. LayerNorm intentionally absent (the
    reference removed it 'for better performance')."""
    c: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):  # x: (B, T, C)
        c, h = self.c, self.num_heads
        dk = c // h

        def lin(name, y, bias=False):
            w = self.param(f"{name}_w", nn.initializers.lecun_normal(),
                           (c, c), jnp.float32)
            out = y @ w.astype(y.dtype)
            if bias:
                b = self.param(f"{name}_b", nn.initializers.zeros, (c,),
                               jnp.float32)
                out = out + b.astype(y.dtype)
            return out

        q = lin("q", x)
        k = lin("k", x)
        v = lin("v", x)
        # torch MultiheadAttention applies its own in/out projections
        qi, ki, vi = lin("in_q", q, True), lin("in_k", k, True), \
            lin("in_v", v, True)
        bsz, t, _ = x.shape

        def split(y):
            return y.reshape(bsz, t, h, dk).transpose(0, 2, 1, 3)

        att = jnp.einsum("bhqd,bhkd->bhqk", split(qi), split(ki)) \
            / jnp.sqrt(dk).astype(x.dtype)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, split(vi))
        out = out.transpose(0, 2, 1, 3).reshape(bsz, t, c)
        x = lin("out", out, True) + x
        return lin("fc2", lin("fc1", x)) + x


class TransformerBlock(nn.Module):
    """common.py:65-93: optional input Conv, learned position embedding
    (linear), n TransformerLayers over HW tokens."""
    c2: int
    num_heads: int = 4
    n: int = 1
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        if x.shape[-1] != self.c2:
            x = ConvBnSiLU(self.c2, 1, bn_axis=self.bn_axis,
                           name="conv")(x, train)
        b, hh, ww, c = x.shape
        tokens = x.reshape(b, hh * ww, c)
        pe_w = self.param("linear_w", nn.initializers.lecun_normal(),
                          (c, c), jnp.float32)
        pe_b = self.param("linear_b", nn.initializers.zeros, (c,),
                          jnp.float32)
        tokens = tokens + (tokens @ pe_w.astype(tokens.dtype)
                           + pe_b.astype(tokens.dtype))
        for j in range(self.n):
            tokens = TransformerLayer(c, self.num_heads,
                                      name=f"tr{j}")(tokens)
        return tokens.reshape(b, hh, ww, c)


class C3TRBlock(C3):
    """C3 whose inner stack is a TransformerBlock (common.py:140-146)."""

    @nn.compact
    def __call__(self, x, train=False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnSiLU(c_, 1, bn_axis=self.bn_axis, name="cv1")(x, train)
        y1 = TransformerBlock(c_, 4, self.n, bn_axis=self.bn_axis,
                              name="m")(y1, train)
        y2 = ConvBnSiLU(c_, 1, bn_axis=self.bn_axis, name="cv2")(x, train)
        return ConvBnSiLU(self.c2, 1, bn_axis=self.bn_axis,
                          name="cv3")(jnp.concatenate([y1, y2], -1), train)


class SPP(nn.Module):
    c2: int
    ks: Tuple[int, ...] = (5, 9, 13)
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        c_ = x.shape[-1] // 2
        x = ConvBnSiLU(c_, 1, bn_axis=self.bn_axis, name="cv1")(x, train)
        pools = [max_pool2d(x, k, 1, k // 2) for k in self.ks]
        return ConvBnSiLU(self.c2, 1, bn_axis=self.bn_axis, name="cv2")(
            jnp.concatenate([x] + pools, -1), train)


class DWConv(nn.Module):
    """Depthwise Conv (common.py DWConv subclasses Conv, so its torch keys
    are conv/bn at its OWN level — params here mirror that flat layout so
    checkpoint keys map 1:1)."""
    c2: int
    k: int = 1
    s: int = 1
    act: bool = True
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        g = math.gcd(x.shape[-1], self.c2)
        x = RawConv(self.c2, self.k, self.s, autopad(self.k, None),
                    groups=g, use_bias=False, name="conv")(x)
        x = BatchNorm(momentum=0.03, epsilon=1e-3, axis_name=self.bn_axis,
                      name="bn")(x, train)
        return jax.nn.silu(x) if self.act else x


class CrossConv(nn.Module):
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        c_ = int(self.c2 * self.e)
        out = ConvBnSiLU(c_, (1, self.k), (1, self.s),
                         bn_axis=self.bn_axis, name="cv1")(x, train)
        out = ConvBnSiLU(self.c2, (self.k, 1), (self.s, 1), g=self.g,
                         bn_axis=self.bn_axis, name="cv2")(out, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + out
        return out


class GhostConv(nn.Module):
    c2: int
    k: int = 1
    s: int = 1
    act: bool = True  # reference GhostConv threads act to BOTH convs
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        c_ = self.c2 // 2
        y = ConvBnSiLU(c_, self.k, self.s, act=self.act,
                       bn_axis=self.bn_axis, name="cv1")(x, train)
        y2 = ConvBnSiLU(c_, 5, 1, g=c_, act=self.act,
                        bn_axis=self.bn_axis, name="cv2")(y, train)
        return jnp.concatenate([y, y2], -1)


class GhostBottleneck(nn.Module):
    """Reference-exact (experimental.py:58-71): pw GhostConv (SiLU) ->
    [s==2 only] DWConv act=False -> pw-linear GhostConv act=False; the
    learned DWConv+Conv shortcut exists ONLY for s==2 (s==1 adds the
    input directly, so c1 must equal c2 there — same constraint torch
    enforces by shape error)."""
    c2: int
    k: int = 3
    s: int = 1
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, bn_axis=self.bn_axis, name="conv0")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False,
                       bn_axis=self.bn_axis, name="conv1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, bn_axis=self.bn_axis,
                      name="conv2")(y, train)
        if self.s != 2:
            return x + y
        sc = DWConv(x.shape[-1], self.k, self.s, act=False,
                    bn_axis=self.bn_axis, name="sc_dw")(x, train)
        sc = ConvBnSiLU(self.c2, 1, act=False, bn_axis=self.bn_axis,
                        name="sc_pw")(sc, train)
        return y + sc


def contract(x, gain=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h // gain, gain, w // gain, gain, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // gain, w // gain, c * gain * gain)


def expand(x, gain=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, gain, gain, c // gain ** 2)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h * gain, w * gain, c // gain ** 2)


# ---------------------------------------------------------------------------
class Sum(nn.Module):
    """(Weighted) sum of 2+ inputs (experimental.py:24-42, BiFPN-style):
    y = x0 + sum_i x[i+1] * (sigmoid(w_i) * 2) when weighted."""
    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs: List[jax.Array],
                 train: bool = False) -> jax.Array:
        y = xs[0]
        if self.weight:
            w_init = -np.arange(1.0, self.n) / 2.0
            w = self.param("w", lambda *_: jnp.asarray(w_init, jnp.float32),
                           (self.n - 1,), jnp.float32)
            w = jax.nn.sigmoid(w.astype(y.dtype)) * 2.0
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class MixConv2d(nn.Module):
    """Mixed-kernel conv (experimental.py:73-94): parallel convs with
    kernel sizes `k` splitting c2 equally, concat -> BN -> LeakyReLU(0.1),
    residual added to the input."""
    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        groups = len(self.k)
        # equal_ch split (experimental.py:78-80)
        idx = np.floor(np.linspace(0, groups - 1e-6, self.c2)).astype(int)
        c_ = [int(np.sum(idx == g)) for g in range(groups)]
        outs = [RawConv(c_[g], self.k[g], self.s, self.k[g] // 2,
                        use_bias=False, name=f"m{g}")(x)
                for g in range(groups)]
        y = jnp.concatenate(outs, axis=-1)
        # initialize_weights sets eps=1e-3/momentum=0.03 on EVERY BN,
        # including this one (torch_utils.py:151-158)
        y = BatchNorm(momentum=0.03, epsilon=1e-3, axis_name=self.bn_axis,
                      name="bn")(y, train)
        y = jnp.where(y > 0, y, 0.1 * y)  # LeakyReLU(0.1)
        return x + y


class Classify(nn.Module):
    """Classification head (common.py:385-395): global average-pool each
    input to (b,1,1,c), channel-concat when given a list, 1x1 conv to c2,
    flatten to (b, c2). Turns any backbone tap into a classifier."""
    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        xs = x if isinstance(x, (list, tuple)) else [x]
        z = jnp.concatenate(
            [jnp.mean(y, axis=(1, 2), keepdims=True) for y in xs], axis=-1)
        z = RawConv(self.c2, self.k, self.s, autopad(self.k),
                    use_bias=True, name="conv")(z)
        return z.reshape(z.shape[0], self.c2)


# ---------------------------------------------------------------------------
# plan + model


def parse_v5_yaml(yaml_text: str, nc_override: Optional[int] = None
                  ) -> Dict[str, Any]:
    import yaml

    d = yaml.safe_load(yaml_text)
    if nc_override is not None:
        d["nc"] = nc_override
    return d


def build_plan(d: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Resolve channels/depth like parse_model (yolo.py:232-283)."""
    nc, gd, gw = d["nc"], d["depth_multiple"], d["width_multiple"]
    anchors = d["anchors"]
    na = len(anchors[0]) // 2 if isinstance(anchors, list) else anchors
    no = na * (nc + 5)
    ch = [3]
    plan = []
    for i, (f, n, m, args) in enumerate(d["backbone"] + d["head"]):
        args = list(args)
        n_rep = max(round(n * gd), 1) if n > 1 else n
        entry = {"i": i, "f": f, "module": m, "n": n_rep, "args": args}
        if m in ("Conv", "GhostConv", "Bottleneck", "GhostBottleneck",
                 "SPP", "DWConv", "MixConv2d", "Focus", "CrossConv",
                 "BottleneckCSP", "C3", "C3TR"):
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            entry["args"] = [c2] + args[1:]
        elif m == "Concat":
            c2 = sum(ch[x] for x in f)
        elif m == "Classify":
            c2 = args[0]
        elif m == "Detect":
            entry["ch_in"] = [ch[x] for x in f]
            c2 = no
        elif m == "Contract":
            c2 = ch[f] * args[0] ** 2
        elif m == "Expand":
            c2 = ch[f] // args[0] ** 2
        else:
            c2 = ch[f if isinstance(f, int) else f[0]]
        entry["c2"] = c2
        plan.append(entry)
        if i == 0:
            ch = []
        ch.append(c2)
    return plan


class YoloV5(nn.Module):
    """yaml-driven v5 detector; returns raw NHWC head maps."""

    yaml_text: str
    num_classes: Optional[int] = None
    bn_axis: Optional[str] = None

    def setup(self):
        d = parse_v5_yaml(self.yaml_text, self.num_classes)
        anchors = d["anchors"]
        self.nc = d["nc"]
        self.anchors_px = np.array(anchors, np.float32).reshape(
            len(anchors), -1, 2)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 up_to: Optional[int] = None) -> List[jax.Array]:
        """Runs the yaml graph; with `up_to=k` returns layer k's output
        (the prefix program — per-layer FLOPs/time profiling measures
        prefix deltas, the analogue of forward_once(profile=True),
        yolov5/models/yolo.py:142-150)."""
        d = parse_v5_yaml(self.yaml_text, self.num_classes)
        plan = build_plan(d)
        na = self.anchors_px.shape[1]
        no = na * (self.nc + 5)
        outputs: List[Optional[jax.Array]] = []
        needed = set()
        for e in plan:
            f = e["f"]
            for src in ([f] if isinstance(f, int) else f):
                if src != -1:
                    # negative refs are layer-relative (yolo.py parse_model)
                    needed.add(src if src >= 0 else e["i"] + src)
        raw_heads: List[jax.Array] = []

        for e in plan:
            i, f, m, n, args = e["i"], e["f"], e["module"], e["n"], e["args"]
            src = (x if f == -1 else outputs[f]) if isinstance(f, int) \
                else [x if j == -1 else outputs[j] for j in f]
            name = f"m{i}"
            ax = self.bn_axis

            def repeat(build, src=None, name=name, n=n):
                # n>1 on a non-C3/CSP module is nn.Sequential repetition
                # (yolo.py parse_model:278 `nn.Sequential(*[m(*args) ...])`;
                # torch keys model.{i}.{j}.* -> params m{i}_{j})
                y = src
                for j in range(n):
                    y = build(f"{name}_{j}" if n > 1 else name)(y, train)
                return y

            if m == "Focus":
                x = repeat(lambda nm: Focus(args[0], *args[1:], bn_axis=ax,
                                            name=nm), src)
            elif m == "Conv":
                x = repeat(lambda nm: ConvBnSiLU(args[0], *args[1:],
                                                 bn_axis=ax, name=nm), src)
            elif m == "DWConv":
                x = repeat(lambda nm: DWConv(args[0], *args[1:], bn_axis=ax,
                                             name=nm), src)
            elif m == "Bottleneck":
                x = repeat(lambda nm: Bottleneck(args[0], *args[1:],
                                                 bn_axis=ax, name=nm), src)
            elif m == "C3":
                sc = args[1] if len(args) > 1 else True
                x = C3(args[0], n=n, shortcut=sc, bn_axis=ax,
                       name=name)(src, train)
            elif m == "C3TR":
                sc = args[1] if len(args) > 1 else True
                x = C3TRBlock(args[0], n=n, shortcut=sc, bn_axis=ax,
                              name=name)(src, train)
            elif m == "BottleneckCSP":
                sc = args[1] if len(args) > 1 else True
                x = BottleneckCSP(args[0], n=n, shortcut=sc, bn_axis=ax,
                                  name=name)(src, train)
            elif m == "SPP":
                ks = tuple(args[1]) if len(args) > 1 else (5, 9, 13)
                x = repeat(lambda nm: SPP(args[0], ks, bn_axis=ax,
                                          name=nm), src)
            elif m == "CrossConv":
                x = repeat(lambda nm: CrossConv(args[0], *args[1:],
                                                bn_axis=ax, name=nm), src)
            elif m == "GhostConv":
                x = repeat(lambda nm: GhostConv(args[0], *args[1:],
                                                bn_axis=ax, name=nm), src)
            elif m == "GhostBottleneck":
                x = repeat(lambda nm: GhostBottleneck(args[0], *args[1:],
                                                      bn_axis=ax, name=nm),
                           src)
            elif m == "MixConv2d":
                ks = tuple(args[1]) if len(args) > 1 else (1, 3)
                s_ = int(args[2]) if len(args) > 2 else 1
                x = repeat(lambda nm: MixConv2d(args[0], ks, s_, bn_axis=ax,
                                                name=nm), src)
            elif m == "Sum":
                x = Sum(len(src), bool(args[0]) if args else False,
                        name=name)(src, train)
            elif m == "Classify":
                x = Classify(args[0], *args[1:], name=name)(src, train)
            elif m == "nn.Upsample":
                scale = int(args[1])
                x = jnp.repeat(jnp.repeat(src, scale, axis=1), scale, axis=2)
            elif m == "Concat":
                x = jnp.concatenate(src, axis=-1)
            elif m == "Contract":
                x = contract(src, args[0])
            elif m == "Expand":
                x = expand(src, args[0])
            elif m == "Detect":
                for li, s in enumerate(src):
                    raw_heads.append(
                        RawConv(no, 1, use_bias=True,
                                name=f"{name}_m{li}")(s))
                x = raw_heads[-1]
            else:
                raise ValueError(f"unsupported v5 module '{m}'")
            if up_to is not None and i == up_to:
                return x
            outputs.append(x if i in needed else None)
        # detection yamls return the raw head maps; a Classify-headed yaml
        # (hub second-stage classifier conversion) returns its logits
        return raw_heads if raw_heads else x


def create_yolov5(yaml_path: str, num_classes: Optional[int] = None,
                  **kwargs) -> YoloV5:
    with open(yaml_path) as f:
        return YoloV5(yaml_text=f.read(), num_classes=num_classes, **kwargs)


def initialize_detect_biases(model: YoloV5, variables: Dict[str, Any],
                             img_size: int = 640,
                             cf: Optional[np.ndarray] = None
                             ) -> Dict[str, Any]:
    """Focal-prior Detect bias init (yolov5/models/yolo.py:176-184, RetinaNet
    §3.3): per level with stride s, obj bias += log(8/(640/s)^2) and cls
    bias += log(0.6/(nc-0.99)) (or log(cf/cf.sum()) given class counts cf).
    Applied to fresh inits only — imported checkpoints carry trained biases.
    """
    d = parse_v5_yaml(model.yaml_text, model.num_classes)
    nc = int(d["nc"])
    anchors = np.array(d["anchors"], np.float32).reshape(
        len(d["anchors"]), -1, 2)
    na = anchors.shape[1]

    shapes = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables,
        jax.ShapeDtypeStruct((1, img_size, img_size, 3), jnp.float32))

    def level_of(name: str) -> int:
        return int(name.rsplit("_m", 1)[1])

    params = {k: dict(v) if isinstance(v, dict) else v
              for k, v in variables["params"].items()}
    head_names = sorted(
        (k for k in params
         if "_m" in k and k.rsplit("_m", 1)[1].isdigit()
         and "bias" in params[k]),
        key=level_of)
    for name in head_names:
        li = level_of(name)
        stride = img_size / shapes[li].shape[1]
        b = np.array(params[name]["bias"], np.float32).reshape(na, 5 + nc)
        b[:, 4] += math.log(8.0 / (640.0 / stride) ** 2)
        if cf is None:
            b[:, 5:] += math.log(0.6 / (nc - 0.99))
        else:
            b[:, 5:] += np.log(np.asarray(cf, np.float64)
                               / np.sum(cf)).astype(np.float32)
        params[name]["bias"] = jnp.asarray(b.reshape(-1))
    return dict(variables, params=params)


def yolov5_heads(model: YoloV5) -> List[YoloHead]:
    """Head metadata for a v5 model (stride derives from each map's grid)."""
    d = parse_v5_yaml(model.yaml_text, model.num_classes)
    a = np.array(d["anchors"], np.float32)
    a = a.reshape(a.shape[0], -1, 2)
    return [YoloHead(a[i], d["nc"], i, v5=True) for i in range(a.shape[0])]


# ---------------------------------------------------------------------------
# torch v5 checkpoint import


def load_yolov5_torch_checkpoint(variables: Dict[str, Any],
                                 path: str,
                                 prefer_ema: bool = True,
                                 intersect: bool = False) -> Dict[str, Any]:
    """Import an ultralytics-v5-era checkpoint ({'model': module, 'ema': ...},
    yolov5/train.py:148-171) into our parameter tree.

    Key mapping: 'model.{i}.<sub>.conv.weight' -> params['m{i}']...['conv']
    ['kernel'] (OIHW->HWIO), '.bn.*' -> BatchNorm scale/bias + batch_stats,
    'model.{24}.m.{j}.weight|bias' -> Detect convs 'm24_m{j}'.

    With `intersect=True`, shape-mismatched tensors are skipped instead of
    raising — the intersect_dicts partial-pretrained-load semantics
    (yolov5/train.py:82-92, torch_utils.py intersect_dicts), so e.g. a
    COCO-nc=80 v5s checkpoint seeds an nc=2 model's backbone.
    """
    import copy

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    model_obj = None
    if isinstance(obj, dict):
        if prefer_ema and obj.get("ema") is not None:
            model_obj = obj["ema"]
        elif "model" in obj:
            model_obj = obj["model"]
    if model_obj is None:
        model_obj = obj
    sd = (model_obj.float().state_dict()
          if hasattr(model_obj, "state_dict") else dict(model_obj))
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in sd.items()}

    variables = copy.deepcopy(jax.device_get(variables))
    params = variables["params"]
    stats = variables.setdefault("batch_stats", {})

    unmatched = []
    skipped = []  # shape-mismatched (only tolerated with intersect=True)
    transferred = 0
    for key, val in sd.items():
        if not key.startswith("model."):
            continue
        parts = key.split(".")
        i = int(parts[1])
        rest = parts[2:]
        if rest and rest[0] == "m" and len(rest) >= 3 and rest[1].isdigit() \
                and rest[-1] in ("weight", "bias") and len(rest) == 3:
            # Detect convs: model.{i}.m.{j}.weight
            name = f"m{i}_m{rest[1]}"
            if name in params:
                tgt = params[name]
                arr = (np.transpose(val, (2, 3, 1, 0))
                       if rest[-1] == "weight" else np.asarray(val))
                slot = "kernel" if rest[-1] == "weight" else "bias"
                if tuple(np.shape(tgt[slot])) != arr.shape:
                    skipped.append(key)
                else:
                    tgt[slot] = arr.astype(np.float32)
                    transferred += 1
                continue
        puts = _transformer_puts(rest, np.asarray(val))
        if puts is not None:
            # C3TR / TransformerBlock leaves (2-D Linear + MultiheadAttention
            # tensors) — see _transformer_puts
            ok = True
            for suffix, leaf_nm, a in puts:
                r = _set_nested(params, [f"m{i}"] + list(suffix), leaf_nm,
                                np.ascontiguousarray(a))
                if r is False:
                    ok = False
                elif r == "shape" and ok is True:
                    ok = "shape"
            if ok == "shape":
                skipped.append(key)
            elif not ok:
                unmatched.append(key)
            else:
                transferred += 1
            continue
        # generic module path: rename m.{j} -> m{j}
        mapped = [f"m{i}"]
        j = 0
        if rest and rest[0].isdigit():
            # nn.Sequential repetition (parse_model:278): model.{i}.{j}.*
            # -> our top-level m{i}_{j}
            mapped = [f"m{i}_{rest[0]}"]
            j = 1
        while j < len(rest) - 1:
            if rest[j] == "m" and rest[j + 1].isdigit():
                mapped.append(f"m{rest[j + 1]}")
                j += 2
            elif (rest[j] == "conv" and j + 1 < len(rest) - 1
                    and rest[j + 1].isdigit()):
                # GhostBottleneck's nn.Sequential branches
                # (experimental.py:63-68): conv.{0,1,2} -> conv{0,1,2},
                # shortcut.{0,1} -> sc_dw/sc_pw
                mapped.append(f"conv{rest[j + 1]}")
                j += 2
            elif (rest[j] == "shortcut" and j + 1 < len(rest) - 1
                    and rest[j + 1] in ("0", "1")):
                mapped.append("sc_dw" if rest[j + 1] == "0" else "sc_pw")
                j += 2
            else:
                mapped.append(rest[j])
                j += 1
        leaf = rest[-1]
        arr = np.asarray(val)
        if mapped and mapped[-1] == "bn":
            if leaf == "weight":
                ok = _set_nested(params, mapped, "scale", arr)
            elif leaf == "bias":
                ok = _set_nested(params, mapped, "bias", arr)
            elif leaf == "running_mean":
                ok = _set_nested(stats, mapped, "mean", arr, create=True)
            elif leaf == "running_var":
                ok = _set_nested(stats, mapped, "var", arr, create=True)
            else:
                ok = True  # num_batches_tracked
        elif leaf == "weight" and arr.ndim == 4:
            ok = _set_nested(params, mapped, "kernel",
                             np.transpose(arr, (2, 3, 1, 0)))
        elif leaf == "bias":
            ok = _set_nested(params, mapped, "bias", arr)
        elif leaf in ("anchors", "anchor_grid"):
            ok = True  # static metadata, read from yaml
        else:
            ok = False
        if ok == "shape":
            skipped.append(key)
        elif not ok:
            unmatched.append(key)
        elif ok is True and leaf != "num_batches_tracked":
            transferred += 1
    if unmatched and not intersect:
        raise ValueError(f"unmatched v5 checkpoint keys: {unmatched[:8]}"
                         f" (+{max(len(unmatched) - 8, 0)} more)")
    if skipped and not intersect:
        raise ValueError(
            f"shape-mismatched v5 checkpoint keys: {skipped[:8]} "
            f"(+{max(len(skipped) - 8, 0)} more) — pass intersect=True for "
            f"partial pretrained load (yolov5/train.py:82-92)")
    if intersect and (skipped or unmatched):
        import logging
        logging.getLogger("rtdm_tpu.yolov5").info(
            "transferred %d items from %s (%d shape-mismatched, %d "
            "unmatched skipped)", transferred, path, len(skipped),
            len(unmatched))
    return variables


def _transformer_puts(rest, arr):
    """Map a TransformerBlock/TransformerLayer torch key tail to a list of
    (path_suffix, leaf_name, value) puts, or None for non-transformer keys.

    torch nn.Linear stores (out, in) and applies x @ W.T; our layers store
    the transposed (in, out) matrix and apply x @ w, so every 2-D weight
    transposes on import. nn.MultiheadAttention packs q/k/v input
    projections into in_proj_weight/bias (3c rows, common.py:55), which we
    split into in_{q,k,v}_{w,b}; out_proj maps to out_{w,b}."""
    if (len(rest) >= 2 and rest[-2] == "linear"
            and rest[-1] in ("weight", "bias") and arr.ndim <= 2):
        # TransformerBlock's learned position embedding (common.py:72)
        prefix = rest[:-2]
        if rest[-1] == "weight":
            return [(prefix, "linear_w", arr.T)]
        return [(prefix, "linear_b", arr)]
    if "tr" not in rest:
        return None
    t = rest.index("tr")
    if t + 2 >= len(rest) or not rest[t + 1].isdigit():
        return None
    prefix = rest[:t] + [f"tr{rest[t + 1]}"]
    tail = rest[t + 2:]
    if (len(tail) == 2 and tail[0] in ("q", "k", "v", "fc1", "fc2")
            and tail[1] == "weight"):
        return [(prefix, f"{tail[0]}_w", arr.T)]
    if tail == ["ma", "in_proj_weight"]:
        qw, kw, vw = np.split(arr, 3, axis=0)
        return [(prefix, "in_q_w", qw.T), (prefix, "in_k_w", kw.T),
                (prefix, "in_v_w", vw.T)]
    if tail == ["ma", "in_proj_bias"]:
        qb, kb, vb = np.split(arr, 3, axis=0)
        return [(prefix, "in_q_b", qb), (prefix, "in_k_b", kb),
                (prefix, "in_v_b", vb)]
    if tail == ["ma", "out_proj", "weight"]:
        return [(prefix, "out_w", arr.T)]
    if tail == ["ma", "out_proj", "bias"]:
        return [(prefix, "out_b", arr)]
    return None


def _set_nested(tree, path_parts, leaf, value, create=False):
    node = tree
    for p in path_parts:
        if p not in node:
            if create:
                node[p] = {}
            else:
                return False
        node = node[p]
    if leaf in node and tuple(np.shape(node[leaf])) != np.shape(value):
        return "shape"
    node[leaf] = value.astype(np.float32)
    return True
