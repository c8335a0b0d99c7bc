"""Oracle tests for the small zoo extras: Sum, MixConv2d
(yolov5/models/experimental.py) and FReLU/AconC/MetaAconC activations
(yolov5/utils/activations.py), each vs a torch-functional oracle."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rtdm_tpu.models.layers import AconC, FReLU, MetaAconC
from rtdm_tpu.models.yolov5 import MixConv2d, Sum, YoloV5


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def test_frelu_matches_torch(rng):
    x = rng.normal(size=(2, 8, 9, 9)).astype(np.float32)
    mod = FReLU()
    xj = jnp.asarray(_nhwc(x))
    variables = mod.init(jax.random.key(0), xj)
    got = mod.apply(variables, xj)

    k = np.transpose(np.asarray(variables["params"]["conv"]["kernel"]),
                     (3, 2, 0, 1))  # HWIO(1ch) -> (C,1,kH,kW)
    with torch.no_grad():
        t = torch.from_numpy(x)
        y = F.conv2d(t, torch.from_numpy(k), None, 1, 1, groups=8)
        # initialize_weights sets eps=1e-3 on every BN (torch_utils.py)
        y = F.batch_norm(y, torch.zeros(8), torch.ones(8), torch.ones(8),
                         torch.zeros(8), training=False, eps=1e-3)
        want = torch.max(t, y).numpy()
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-5,
                               atol=1e-5)


def test_aconc_matches_torch(rng):
    x = rng.normal(size=(2, 4, 5, 5)).astype(np.float32)
    mod = AconC()
    xj = jnp.asarray(_nhwc(x))
    variables = mod.init(jax.random.key(1), xj)
    got = mod.apply(variables, xj)

    p = variables["params"]
    p1 = np.asarray(p["p1"]).reshape(1, 4, 1, 1)
    p2 = np.asarray(p["p2"]).reshape(1, 4, 1, 1)
    beta = np.asarray(p["beta"]).reshape(1, 4, 1, 1)
    with torch.no_grad():
        t = torch.from_numpy(x)
        dpx = (torch.from_numpy(p1) - torch.from_numpy(p2)) * t
        want = (dpx * torch.sigmoid(torch.from_numpy(beta) * dpx)
                + torch.from_numpy(p2) * t).numpy()
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-5,
                               atol=1e-5)


def test_meta_aconc_matches_torch(rng):
    c = 32
    x = rng.normal(size=(2, c, 6, 6)).astype(np.float32)
    mod = MetaAconC()
    xj = jnp.asarray(_nhwc(x))
    variables = mod.init(jax.random.key(2), xj)
    got = mod.apply(variables, xj)

    p = variables["params"]
    p1 = np.asarray(p["p1"]).reshape(1, c, 1, 1)
    p2 = np.asarray(p["p2"]).reshape(1, c, 1, 1)
    w1 = np.transpose(np.asarray(p["fc1"]["kernel"]), (3, 2, 0, 1))
    b1 = np.asarray(p["fc1"]["bias"])
    w2 = np.transpose(np.asarray(p["fc2"]["kernel"]), (3, 2, 0, 1))
    b2 = np.asarray(p["fc2"]["bias"])
    with torch.no_grad():
        t = torch.from_numpy(x)
        y = t.mean(dim=2, keepdims=True).mean(dim=3, keepdims=True)
        y = F.conv2d(y, torch.from_numpy(w1), torch.from_numpy(b1))
        y = F.conv2d(y, torch.from_numpy(w2), torch.from_numpy(b2))
        beta = torch.sigmoid(y)
        dpx = (torch.from_numpy(p1) - torch.from_numpy(p2)) * t
        want = (dpx * torch.sigmoid(beta * dpx)
                + torch.from_numpy(p2) * t).numpy()
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-5,
                               atol=1e-5)


def test_sum_weighted(rng):
    xs = [jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
          for _ in range(3)]
    mod = Sum(3, weight=True)
    variables = mod.init(jax.random.key(3), xs)
    got = np.asarray(mod.apply(variables, xs))
    # init matches the reference: w = -arange(1, n)/2 (experimental.py:31)
    w_init = -np.arange(1.0, 3.0) / 2.0
    np.testing.assert_allclose(np.asarray(variables["params"]["w"]), w_init)
    w = 1.0 / (1.0 + np.exp(-w_init)) * 2.0
    want = (np.asarray(xs[0]) + np.asarray(xs[1]) * w[0]
            + np.asarray(xs[2]) * w[1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # unweighted = plain sum
    mod0 = Sum(3)
    got0 = np.asarray(mod0.apply(mod0.init(jax.random.key(4), xs), xs))
    np.testing.assert_allclose(
        got0, np.asarray(xs[0]) + np.asarray(xs[1]) + np.asarray(xs[2]),
        rtol=1e-5, atol=1e-6)


def test_mixconv2d_matches_torch(rng):
    c1 = c2 = 8
    x = rng.normal(size=(2, c1, 8, 8)).astype(np.float32)
    mod = MixConv2d(c2, (1, 3))
    xj = jnp.asarray(_nhwc(x))
    variables = mod.init(jax.random.key(5), xj)
    got = mod.apply(variables, xj)

    p = variables["params"]
    with torch.no_grad():
        t = torch.from_numpy(x)
        outs = []
        for g, k in enumerate((1, 3)):
            w = np.transpose(np.asarray(p[f"m{g}"]["kernel"]), (3, 2, 0, 1))
            outs.append(F.conv2d(t, torch.from_numpy(w), None, 1, k // 2))
        y = torch.cat(outs, 1)
        # initialize_weights sets eps=1e-3 on every BN (torch_utils.py)
        y = F.batch_norm(y, torch.zeros(c2), torch.ones(c2), torch.ones(c2),
                         torch.zeros(c2), training=False, eps=1e-3)
        want = (t + F.leaky_relu(y, 0.1)).numpy()
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-5,
                               atol=1e-5)


MIXCONV_YAML = """
nc: 2
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10,13, 16,30, 33,23]
backbone:
  [[-1, 1, Conv, [16, 3, 2]],
   [-1, 1, MixConv2d, [16, [1, 3], 1]],
   [-1, 1, Conv, [16, 3, 1]],
   [[-1, -2], 1, Sum, [0]],
  ]
head:
  [[[3], 1, Detect, [nc, anchors]],
  ]
"""


def test_mixconv_sum_in_yaml_graph(rng):
    """MixConv2d and Sum are buildable from a v5 yaml plan."""
    model = YoloV5(yaml_text=MIXCONV_YAML)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    (out,) = model.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 3 * 7)


def test_darknet_parametric_activations(rng):
    """frelu/aconc cfg activations build and run in the darknet graph."""
    from rtdm_tpu.models.darknet import Darknet

    cfg = """
[net]
width=32
height=32
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=frelu
[convolutional]
filters=8
size=1
stride=1
pad=1
activation=aconc
[convolutional]
size=1
stride=1
pad=1
filters=21
activation=linear
[yolo]
mask = 0,1,2
anchors = 10,13,  16,30,  33,23
classes=2
num=3
"""
    model = Darknet(cfg_text=cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    assert "l0_act" in variables["params"]   # FReLU conv+bn params
    assert "beta" in variables["params"]["l1_act"]  # AconC params
    (raw,) = model.apply(variables, x, train=False)
    assert raw.shape == (1, 16, 16, 21)
    assert bool(jnp.all(jnp.isfinite(raw)))
