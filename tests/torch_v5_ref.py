"""Minimal torch mirror of the v5 block zoo for parity-test oracles.

Built from the reference's block *semantics* (yolov5/models/common.py) with
ultralytics-compatible module naming, so its state_dict has real v5
checkpoint keys (model.{i}.conv.weight, ...) — used both as a forward
oracle and to synthesize checkpoints for import tests.
"""

import math

import torch
import torch.nn as nn


def autopad(k, p=None):
    return k // 2 if p is None else p


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k, p), groups=g,
                              bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Focus(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = Conv(c1 * 4, c2, k, s)

    def forward(self, x):
        return self.conv(torch.cat(
            [x[..., ::2, ::2], x[..., 1::2, ::2],
             x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1))


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_, c2, 3, 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *[Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class BottleneckCSP(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = nn.Conv2d(c1, c_, 1, 1, bias=False)
        self.cv3 = nn.Conv2d(c_, c_, 1, 1, bias=False)
        self.cv4 = Conv(2 * c_, c2, 1, 1)
        self.bn = nn.BatchNorm2d(2 * c_, eps=1e-3, momentum=0.03)
        self.act = nn.LeakyReLU(0.1)
        self.m = nn.Sequential(
            *[Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)])

    def forward(self, x):
        y1 = self.cv3(self.m(self.cv1(x)))
        y2 = self.cv2(x)
        return self.cv4(self.act(self.bn(torch.cat((y1, y2), 1))))


class SPP(nn.Module):
    def __init__(self, c1, c2, k=(5, 9, 13)):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * (len(k) + 1), c2, 1, 1)
        self.m = nn.ModuleList(
            [nn.MaxPool2d(kernel_size=x, stride=1, padding=x // 2)
             for x in k])

    def forward(self, x):
        x = self.cv1(x)
        return self.cv2(torch.cat([x] + [m(x) for m in self.m], 1))


def parse_model_param_count(d):
    """Independent parse_model mirror (yolo.py:232-283 channel/depth
    arithmetic) that BUILDS each torch block and returns the total param
    count — the oracle for exact yaml-zoo param parity (v5.0 yamls use
    Focus/Conv/C3/SPP/Upsample/Concat/Detect only)."""
    nc, gd, gw = d["nc"], d["depth_multiple"], d["width_multiple"]
    anchors = d["anchors"]
    na = len(anchors[0]) // 2 if isinstance(anchors, list) else anchors
    no = na * (nc + 5)
    ch = [3]
    total = 0
    for i, (f, n, m, args) in enumerate(d["backbone"] + d["head"]):
        n_ = max(round(n * gd), 1) if n > 1 else n
        mod = None
        if m in ("Conv", "Focus", "SPP", "C3", "BottleneckCSP"):
            c1 = ch[f]
            c2 = args[0]
            if c2 != no:
                c2 = int(math.ceil(c2 * gw / 8) * 8)
            if m in ("C3", "BottleneckCSP"):
                mod = {"C3": C3, "BottleneckCSP": BottleneckCSP}[m](
                    c1, c2, n_)
            else:
                mod = {"Conv": Conv, "Focus": Focus, "SPP": SPP}[m](
                    c1, c2, *args[1:])
        elif m == "Concat":
            c2 = sum(ch[x] for x in f)
        elif m == "nn.Upsample":
            c2 = ch[f]
        elif m == "Detect":
            mod = nn.ModuleList(nn.Conv2d(ch[x], no, 1) for x in f)
            c2 = no
        else:
            raise ValueError(f"oracle does not model {m}")
        if mod is not None:
            total += sum(p.numel() for p in mod.parameters())
        if i == 0:
            ch = []
        ch.append(c2)
    return total


class DWConv(Conv):
    """Depthwise Conv oracle (common.py:26-29: Conv with g=gcd(c1,c2))."""

    def __init__(self, c1, c2, k=1, s=1, act=True):
        import math
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class GhostConv(nn.Module):
    """GhostConv oracle (experimental.py:45-55): act threads to BOTH
    convs; cv2 is a 5x5 depthwise over the hidden half."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = Conv(c1, c_, k, s, None, g, act)
        self.cv2 = Conv(c_, c_, 5, 1, None, c_, act)

    def forward(self, x):
        y = self.cv1(x)
        return torch.cat([y, self.cv2(y)], 1)


class GhostBottleneck(nn.Module):
    """GhostBottleneck oracle (experimental.py:58-71): pw GhostConv ->
    [s==2] DWConv act=False -> pw-linear GhostConv act=False; learned
    DWConv+Conv shortcut only for s==2, Identity otherwise."""

    def __init__(self, c1, c2, k=3, s=1):
        super().__init__()
        c_ = c2 // 2
        self.conv = nn.Sequential(
            GhostConv(c1, c_, 1, 1),
            DWConv(c_, c_, k, s, act=False) if s == 2 else nn.Identity(),
            GhostConv(c_, c2, 1, 1, act=False))
        self.shortcut = nn.Sequential(
            DWConv(c1, c1, k, s, act=False),
            Conv(c1, c2, 1, 1, act=False)) if s == 2 else nn.Identity()

    def forward(self, x):
        return self.conv(x) + self.shortcut(x)


class TransformerLayer(nn.Module):
    """common.py:48-62 — q/k/v pre-projections (no bias), 4-head MHA,
    2-layer no-bias MLP, both residual, no LayerNorm."""

    def __init__(self, c, num_heads):
        super().__init__()
        self.q = nn.Linear(c, c, bias=False)
        self.k = nn.Linear(c, c, bias=False)
        self.v = nn.Linear(c, c, bias=False)
        self.ma = nn.MultiheadAttention(embed_dim=c, num_heads=num_heads)
        self.fc1 = nn.Linear(c, c, bias=False)
        self.fc2 = nn.Linear(c, c, bias=False)

    def forward(self, x):  # (T, B, C) seq-first
        x = self.ma(self.q(x), self.k(x), self.v(x))[0] + x
        return self.fc2(self.fc1(x)) + x


class TransformerBlock(nn.Module):
    """common.py:65-93 — optional input Conv, learned position embedding
    ('linear'), n TransformerLayers over HW tokens."""

    def __init__(self, c1, c2, num_heads, num_layers):
        super().__init__()
        self.conv = None
        if c1 != c2:
            self.conv = Conv(c1, c2)
        self.linear = nn.Linear(c2, c2)
        self.tr = nn.Sequential(*[TransformerLayer(c2, num_heads)
                                  for _ in range(num_layers)])
        self.c2 = c2

    def forward(self, x):
        if self.conv is not None:
            x = self.conv(x)
        b = x.shape[0]
        h, w = x.shape[2], x.shape[3]
        p = x.flatten(2).unsqueeze(0).transpose(0, 3).squeeze(3)  # (HW,B,C)
        x = self.tr(p + self.linear(p))
        return x.unsqueeze(3).transpose(0, 3).reshape(b, self.c2, h, w)


class C3TR(C3):
    """common.py:140-146 — C3 whose inner stack is a TransformerBlock."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = TransformerBlock(c_, c_, 4, n)


class TorchV5Model(nn.Module):
    """Forward-capable parse_model mirror (yolo.py:232-283 channel/depth
    arithmetic + forward_once yolo.py:119-135 graph walk) over the oracle
    block zoo, with ultralytics key layout (model.{i}, Sequential
    repetition model.{i}.{j}, Detect at model.{i}.m.{j}) — the independent
    end-to-end oracle for random-yaml fuzz parity."""

    _WIDTH = ("Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP",
              "DWConv", "Focus", "BottleneckCSP", "C3", "C3TR")
    _ZOO = {"Conv": Conv, "GhostConv": GhostConv, "Bottleneck": Bottleneck,
            "GhostBottleneck": GhostBottleneck, "SPP": SPP,
            "DWConv": DWConv, "Focus": Focus,
            "BottleneckCSP": BottleneckCSP, "C3": C3, "C3TR": C3TR}

    def __init__(self, d):
        super().__init__()
        nc, gd, gw = d["nc"], d["depth_multiple"], d["width_multiple"]
        anchors = d["anchors"]
        na = len(anchors[0]) // 2 if isinstance(anchors, list) else anchors
        no = na * (nc + 5)
        ch = [3]
        self.froms, self.kinds = [], []
        self.model = nn.Sequential()
        for i, (f, n, m, args) in enumerate(d["backbone"] + d["head"]):
            n_ = max(round(n * gd), 1) if n > 1 else n
            c1 = ch[f if isinstance(f, int) else f[0]]
            if m in self._WIDTH:
                c2 = args[0]
                if c2 != no:
                    c2 = int(math.ceil(c2 * gw / 8) * 8)
                cls = self._ZOO[m]
                if m in ("BottleneckCSP", "C3", "C3TR"):
                    sc = args[1] if len(args) > 1 else True
                    mod = cls(c1, c2, n_, shortcut=sc)
                elif m == "SPP":
                    k = tuple(args[1]) if len(args) > 1 else (5, 9, 13)
                    mod = cls(c1, c2, k)
                elif n_ > 1:  # Sequential repetition: m(*args) x n_
                    mod = nn.Sequential(*[cls(c1, c2, *args[1:])
                                          for _ in range(n_)])
                else:
                    mod = cls(c1, c2, *args[1:])
            elif m == "nn.Upsample":
                mod = nn.Upsample(scale_factor=args[1], mode=args[2])
                c2 = c1
            elif m == "Concat":
                mod = nn.Identity()
                c2 = sum(ch[x] for x in f)
            elif m == "Detect":
                mod = nn.Module()
                mod.m = nn.ModuleList(nn.Conv2d(ch[x], no, 1) for x in f)
                c2 = no
            else:
                raise ValueError(f"oracle does not model {m}")
            self.model.add_module(str(i), mod)
            self.froms.append(f)
            self.kinds.append(m)
            if i == 0:
                ch = []
            ch.append(c2)

    def forward(self, x):
        y = []
        for i, mod in enumerate(self.model):
            f, m = self.froms[i], self.kinds[i]
            xi = (x if f == -1 else y[f]) if isinstance(f, int) \
                else [x if j == -1 else y[j] for j in f]
            if m == "Concat":
                x = torch.cat(xi, 1)
            elif m == "Detect":
                return [mod.m[j](s) for j, s in enumerate(xi)]
            else:
                x = mod(xi)
            y.append(x)
        return x
