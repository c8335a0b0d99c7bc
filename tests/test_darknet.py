"""Darknet cfg graph tests: parsing, shapes on the real reference cfgs,
weight-binary round trip, and forward parity vs a torch-functional oracle
on the tiny cfg."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.models.darknet import (
    Darknet,
    create_darknet,
    init_darknet,
    load_darknet_weights,
    parse_darknet_cfg,
    save_darknet_weights,
)
from tests.conftest import REFERENCE_ROOT, needs_reference

CFG_DIR = REFERENCE_ROOT / "code/victim_localization/yolov3/cfg"


def test_parse_cfg_values():
    text = """
[net]
width=416
[convolutional]
batch_normalize=1
filters=16
size=3
pad=1
activation=leaky
[yolo]
mask = 0,1
anchors = 10,14,  23,27,  37,58
classes=2
"""
    blocks = parse_darknet_cfg(text)
    assert blocks[0] == {"type": "net", "width": 416}
    assert blocks[1]["filters"] == 16 and blocks[1]["batch_normalize"] == 1
    assert blocks[2]["mask"] == (0, 1)
    assert blocks[2]["anchors"] == ((10.0, 14.0), (23.0, 27.0), (37.0, 58.0))


@needs_reference
@pytest.mark.parametrize("cfg,heads,img", [
    ("yolov3-tiny-aider-416.cfg", 2, 416),
    ("yolov4-tiny-aider-416.cfg", 3, 416),
    ("yolov3-acffx.cfg", 3, 416),
])
def test_reference_cfgs_build_and_run(cfg, heads, img):
    model = create_darknet(str(CFG_DIR / cfg))
    variables = init_darknet(model, img)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    raw = model.apply(variables, x)
    bound = model.bind(variables)
    assert len(raw) == len(bound.heads) == heads
    for p, h in zip(raw, bound.heads):
        assert p.shape[-1] == h.na * h.no
        if "acff" not in cfg:
            assert img % p.shape[1] == 0  # grid divides input
        else:
            # ACFF blocks shrink H,W by 2 each (valid-padding dilated convs),
            # so acffx grids are not exact divisors — just sane.
            assert 0 < p.shape[1] < img


@needs_reference
def test_weights_binary_roundtrip(tmp_path):
    model = create_darknet(str(CFG_DIR / "yolov4-tiny-aider-416.cfg"))
    variables = init_darknet(model, 416, seed=3)
    path = str(tmp_path / "w.weights")
    save_darknet_weights(variables, model.cfg_text, path)
    # perturb, then restore from the binary
    blank = init_darknet(model, 416, seed=99)
    restored = load_darknet_weights(blank, model.cfg_text, path)
    def by_key(pairs):
        return sorted(((str(k), v) for k, v in pairs), key=lambda kv: kv[0])

    for (ka, a), (kb, b) in zip(
            by_key(jax.tree_util.tree_leaves_with_path(variables["params"])),
            by_key(jax.tree_util.tree_leaves_with_path(restored["params"]))):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=ka)
    for a, b in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                    jax.tree_util.tree_leaves(restored["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@needs_reference
@pytest.mark.parametrize("cfg_name", [
    "yolov3-tiny-aider-416.cfg",
    # exercises grouped [route] (CSP channel split), true-darknet semantics
    "yolov4-tiny-3l-512x512.cfg",
])
def test_tiny_forward_parity_vs_torch(rng, cfg_name):
    """Execute the cfg's graph with torch.nn.functional as the oracle."""
    import torch
    import torch.nn.functional as F

    cfg_path = str(CFG_DIR / cfg_name)
    model = create_darknet(cfg_path)
    img = 224  # smaller for speed; strides still divide
    variables = init_darknet(model, img, seed=1)
    x = rng.normal(size=(1, img, img, 3)).astype(np.float32) * 0.5
    raw = model.apply(variables, jnp.asarray(x))
    defs = parse_darknet_cfg(cfg_path)[1:]
    _assert_matches_torch_oracle(defs, variables, x, raw)


def _assert_matches_torch_oracle(defs, variables, x, raw):
    """Walk the cfg defs with torch.nn.functional as the oracle and
    compare every yolo tap against the flax forward."""
    import torch
    import torch.nn.functional as F

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    outputs, yolo = [], []
    for i, d in enumerate(defs):
        ty = d["type"]
        if ty == "convolutional":
            k = int(d.get("size", 1))
            w = torch.from_numpy(np.transpose(
                np.asarray(params[f"l{i}_conv"]["kernel"]), (3, 2, 0, 1)).copy())
            bias = None
            if not d.get("batch_normalize", 0):
                bias = torch.from_numpy(np.asarray(params[f"l{i}_conv"]["bias"]))
            t = F.conv2d(t, w, bias, stride=int(d.get("stride", 1)),
                         padding=(k - 1) // 2 if d.get("pad", 0) else 0)
            if d.get("batch_normalize", 0):
                bn, st = params[f"l{i}_bn"], stats[f"l{i}_bn"]
                t = F.batch_norm(
                    t, torch.from_numpy(np.asarray(st["mean"])),
                    torch.from_numpy(np.asarray(st["var"])),
                    torch.from_numpy(np.asarray(bn["scale"])),
                    torch.from_numpy(np.asarray(bn["bias"])),
                    training=False, eps=1e-4)
            if d.get("activation") == "leaky":
                t = F.leaky_relu(t, 0.1)
        elif ty == "maxpool":
            k, s = int(d["size"]), int(d["stride"])
            if k == 2 and s == 1:
                # the reference zero-pads here (nn.ZeroPad2d((0,1,0,1)),
                # models.py:62-63) — NOT -inf
                t = F.max_pool2d(F.pad(t, (0, 1, 0, 1), value=0.0), 2, 1)
            else:
                t = F.max_pool2d(t, k, s, padding=(k - 1) // 2)
        elif ty == "upsample":
            t = F.interpolate(t, scale_factor=int(d["stride"]),
                              mode="nearest")
        elif ty == "route":
            srcs = [outputs[li if li >= 0 else i + li] for li in d["layers"]]
            g = int(d.get("groups", 1))
            if g > 1:  # true-darknet grouped route: group_id-th NCHW slice
                gid = int(d.get("group_id", 0))
                srcs = [s[:, (s.shape[1] // g) * gid:
                          (s.shape[1] // g) * (gid + 1)] for s in srcs]
            t = torch.cat(srcs, 1) if len(srcs) > 1 else srcs[0]
        elif ty == "yolo":
            yolo.append(t)
        outputs.append(t)

    assert len(yolo) == len(raw)
    for got, want in zip(raw, yolo):
        want_nhwc = np.transpose(want.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), want_nhwc,
                                   rtol=2e-4, atol=2e-4)


@needs_reference
def test_torch_checkpoint_import_smoke(tmp_path):
    """Round-trip a synthetic fork-style checkpoint through the importer."""
    import torch

    from rtdm_tpu.models.darknet import load_darknet_torch_checkpoint

    cfg_path = str(CFG_DIR / "yolov3-tiny-aider-416.cfg")
    model = create_darknet(cfg_path)
    variables = init_darknet(model, 416, seed=5)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sd = {}
    defs = parse_darknet_cfg(model.cfg_text)[1:]
    for i, d in enumerate(defs):
        if d["type"] != "convolutional":
            continue
        k = np.transpose(np.asarray(params[f"l{i}_conv"]["kernel"]),
                         (3, 2, 0, 1)).copy()
        sd[f"module_list.{i}.Conv2d.weight"] = torch.from_numpy(k)
        if d.get("batch_normalize", 0):
            sd[f"module_list.{i}.BatchNorm2d.weight"] = torch.from_numpy(
                np.asarray(params[f"l{i}_bn"]["scale"]).copy())
            sd[f"module_list.{i}.BatchNorm2d.bias"] = torch.from_numpy(
                np.asarray(params[f"l{i}_bn"]["bias"]).copy())
            sd[f"module_list.{i}.BatchNorm2d.running_mean"] = torch.from_numpy(
                np.asarray(stats[f"l{i}_bn"]["mean"]).copy())
            sd[f"module_list.{i}.BatchNorm2d.running_var"] = torch.from_numpy(
                np.asarray(stats[f"l{i}_bn"]["var"]).copy())
        else:
            sd[f"module_list.{i}.Conv2d.bias"] = torch.from_numpy(
                np.asarray(params[f"l{i}_conv"]["bias"]).copy())
    path = str(tmp_path / "ckpt.pt")
    torch.save({"model": sd}, path)

    blank = init_darknet(model, 416, seed=77)
    restored = load_darknet_torch_checkpoint(blank, model.cfg_text, path)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@needs_reference
def test_all_reference_cfgs_build(rng):
    """Every shipped cfg builds and runs at its design size."""
    import glob

    sizes = {"yolov4-tiny-3l-512x512.cfg": 512, "yolov3-acffx.cfg": 416}
    for cfg in sorted(
            glob.glob(str(CFG_DIR / "*.cfg"))):
        name = cfg.split("/")[-1]
        size = sizes.get(name, 256)
        model = create_darknet(cfg)
        variables = init_darknet(model, size)
        raw = model.apply(variables, jnp.zeros((1, size, size, 3)))
        bound = model.bind(variables)
        assert len(raw) == len(bound.heads) >= 2, name
        for p, h in zip(raw, bound.heads):
            assert p.shape[-1] == h.na * h.no, name


GROUPED_CFG = """
[net]
width=32
height=32

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
groups=4
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=4
activation=linear
"""


def test_grouped_convolutional_block(tmp_path):
    """[convolutional] groups=N builds a grouped conv (models.py:33) with
    the grouped param count, matches a torch grouped-conv oracle, and
    round-trips through the darknet .weights binary."""
    import torch
    import torch.nn.functional as F

    from rtdm_tpu.models.darknet import (Darknet, load_darknet_weights,
                                         save_darknet_weights)

    model = Darknet(cfg_text=GROUPED_CFG)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    k1 = variables["params"]["l1_conv"]["kernel"]
    assert k1.shape == (3, 3, 4, 16)  # cin/groups = 16/4

    # torch oracle for the grouped layer alone
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 8, 8)).astype(np.float32)
    kr = rng.normal(size=(3, 3, 4, 16)).astype(np.float32) * 0.2
    from rtdm_tpu.ops.convpool import conv2d
    got = conv2d(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                 jnp.asarray(kr), None, 1, 1, 1, 4)
    with torch.no_grad():
        want = F.conv2d(torch.from_numpy(x),
                        torch.from_numpy(np.transpose(kr, (3, 2, 0, 1))),
                        None, 1, 1, groups=4).numpy()
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)

    # .weights binary round trip preserves every tensor
    w = str(tmp_path / "g.weights")
    save_darknet_weights(variables, GROUPED_CFG, w)
    blank = model.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
    back = load_darknet_weights(blank, GROUPED_CFG, w)
    for name in ("l0_conv", "l1_conv", "l2_conv"):
        np.testing.assert_allclose(
            back["params"][name]["kernel"],
            np.asarray(variables["params"][name]["kernel"]), rtol=1e-6)


def test_torch_checkpoint_imports_fusion_weights(tmp_path):
    """weightedFeatureFusion layer weights (module_list.{i}.w,
    ref models.py:126-138) must land in l{i}_w, not be silently dropped."""
    import torch

    from rtdm_tpu.models.darknet import Darknet, load_darknet_torch_checkpoint

    cfg = "\n".join([
        "[net]", "width=64", "height=64", "channels=3", "",
        "[convolutional]", "filters=8", "size=3", "stride=1", "pad=1",
        "activation=leaky", "",
        "[convolutional]", "filters=8", "size=3", "stride=1", "pad=1",
        "activation=leaky", "",
        "[shortcut]", "from=-2", "activation=linear",
        "weights_type=per_feature", ""])
    model = Darknet(cfg_text=cfg)
    variables = init_darknet(model, 64, seed=0)
    assert "l2_w" in jax.device_get(variables["params"])

    w = np.array([0.7, -0.3], np.float32)
    path = str(tmp_path / "w.pt")
    torch.save({"model": {"module_list.2.w": torch.from_numpy(w)}}, path)
    restored = load_darknet_torch_checkpoint(variables, cfg, path)
    np.testing.assert_allclose(np.asarray(restored["params"]["l2_w"]), w)
    # and the weighted graph still runs
    out = model.apply(restored, jnp.zeros((1, 64, 64, 3)), train=False)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def _random_cfg_text(rng, nc=2, na=3):
    """Random small darknet graph over the supported block set
    (conv/maxpool/upsample/route incl. grouped) with a final yolo head —
    a property test for the cfg->graph builder: any generated graph must
    match the torch-functional oracle exactly."""
    blocks = ["[net]\nwidth=64\nheight=64"]
    meta = []  # (out_channels, spatial) per emitted block
    c, h = 3, 64

    def conv(filters, k, stride, bn, act):
        nonlocal c, h
        lines = ["[convolutional]"]
        if bn:
            lines.append("batch_normalize=1")
        lines += [f"filters={filters}", f"size={k}", f"stride={stride}",
                  "pad=1", f"activation={act}"]
        blocks.append("\n".join(lines))
        c, h = filters, h // stride
        meta.append((c, h))

    conv(int(rng.choice([8, 16])), 3, 2, 1, "leaky")
    n_body = int(rng.integers(5, 10))
    for _ in range(n_body):
        r = rng.random()
        if r < 0.45:
            conv(int(rng.choice([8, 12, 16, 24, 32])),
                 int(rng.choice([1, 3])),
                 int(rng.choice([1, 2])) if h >= 16 else 1,
                 int(rng.random() < 0.8),
                 "leaky" if rng.random() < 0.8 else "linear")
        elif r < 0.6 and h >= 8:
            k, s = [(2, 2), (2, 1), (3, 1)][int(rng.integers(3))]
            blocks.append(f"[maxpool]\nsize={k}\nstride={s}")
            if s == 2:
                h //= 2
            meta.append((c, h))
        elif r < 0.7 and h <= 16:
            blocks.append("[upsample]\nstride=2")
            h *= 2
            meta.append((c, h))
        else:
            cands = [j for j, (cc, ss) in enumerate(meta) if ss == h]
            n_src = min(len(cands), int(rng.choice([1, 2])))
            srcs = list(rng.choice(cands, n_src, replace=False))
            lines = ["[route]",
                     "layers=" + ",".join(str(int(j)) for j in srcs)]
            cs = [meta[int(j)][0] for j in srcs]
            if (rng.random() < 0.4 and len(srcs) >= 1
                    and all(cc % 2 == 0 for cc in cs)):
                gid = int(rng.integers(2))
                lines += ["groups=2", f"group_id={gid}"]
                c = sum(cc // 2 for cc in cs)
            else:
                c = sum(cs)
            blocks.append("\n".join(lines))
            meta.append((c, h))
    conv(na * (nc + 5), 1, 1, 0, "linear")
    blocks.append("[yolo]\nmask = 0,1,2\n"
                  "anchors = 10,13,  16,30,  33,23\n"
                  f"classes={nc}\nnum={na}")
    meta.append((c, h))
    return "\n\n".join(blocks) + "\n"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_random_graph_fuzz_parity(seed, tmp_path):
    """Property test: RANDOM small graphs over the full supported block
    set build, run, and match the torch oracle bit-for-bit (to fp tol) —
    hardens the cfg->graph builder beyond the shipped cfgs. Also asserts
    the darknet .weights binary codec (models.py:450-512 layout) is an
    exact round trip on every random graph."""
    from rtdm_tpu.models.darknet import (Darknet, load_darknet_weights,
                                         save_darknet_weights)

    rng = np.random.default_rng(seed)
    text = _random_cfg_text(rng)
    model = Darknet(cfg_text=text)
    variables = init_darknet(model, 64, seed=seed)
    # randomize BN stats so normalization is non-trivial
    stats = jax.device_get(variables["batch_stats"])
    for bn in stats.values():
        bn["mean"] = rng.normal(0, 0.3, bn["mean"].shape).astype(np.float32)
        bn["var"] = rng.uniform(0.5, 1.5, bn["var"].shape).astype(np.float32)
    variables = {"params": variables["params"], "batch_stats": stats}

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.5
    raw = model.apply(variables, jnp.asarray(x))
    defs = parse_darknet_cfg(text)[1:]
    _assert_matches_torch_oracle(defs, variables, x, raw)

    # .weights round trip: save, load into a fresh init, identical outputs
    w = str(tmp_path / f"fuzz{seed}.weights")
    save_darknet_weights(variables, text, w)
    blank = init_darknet(model, 64, seed=seed + 999)
    restored = load_darknet_weights(blank, text, w)
    raw2 = model.apply(restored, jnp.asarray(x))
    for a, b in zip(raw, raw2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
