"""AutoShape wrapper + Classify head tests (yolov5 common.py:237-395
analogues)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TINY_CFG = """
[net]
width=96
height=96
[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky
[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky
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


@pytest.fixture(scope="module")
def tiny_detector(tmp_path_factory):
    from rtdm_tpu.export.detector import DetectorSpec, build_detector
    cfg = tmp_path_factory.mktemp("cfg") / "tiny.cfg"
    cfg.write_text(TINY_CFG)
    spec = DetectorSpec(cfg_name="tiny", img_size=96, conf_thres=0.01,
                        quant="fp32")
    return build_detector(str(cfg), None, spec, batch_size=2)


def test_autoshape_mixed_inputs(tiny_detector, tmp_path):
    from PIL import Image
    from rtdm_tpu.export.autoshape import AutoShape

    rng = np.random.default_rng(0)
    arr_small = rng.integers(0, 255, (50, 80, 3)).astype(np.uint8)
    arr_tall = rng.integers(0, 255, (200, 64, 3)).astype(np.uint8)
    gray = rng.integers(0, 255, (60, 60)).astype(np.uint8)
    pil = Image.fromarray(arr_small)
    path = str(tmp_path / "frame.jpg")
    pil.save(path)
    f01 = rng.random((40, 40, 3)).astype(np.float32)  # 0-1 float input

    auto = AutoShape(tiny_detector, names=["person", "vehicle"])
    res = auto([arr_small, arr_tall, gray, pil, path, f01])
    assert len(res) == 6
    shapes = [(50, 80), (200, 64), (60, 60), (50, 80), (50, 80), (40, 40)]
    for d, (h, w) in zip(res.xyxy, shapes):
        assert d.ndim == 2 and d.shape[1] == 6
        if d.size:
            # boxes live in ORIGINAL-image pixel space
            assert (d[:, [0, 2]] <= w + 1e-3).all() and (d[:, 0] >= 0).all()
            assert (d[:, [1, 3]] <= h + 1e-3).all() and (d[:, 1] >= 0).all()
    # views
    recs = res.to_dicts()
    assert len(recs) == 6
    for drows, rrows in zip(res.xyxy, recs):
        assert len(rrows) == len(drows)
        for r in rrows:
            assert r["name"] in ("person", "vehicle")
    assert "frame.jpg" in res.summary()
    rendered = res.render()
    assert rendered[1].shape == (200, 64, 3)
    saved = res.save(str(tmp_path / "out"))
    assert len(saved) == 6


def test_autoshape_single_input_and_engine_dir(tiny_detector, tmp_path):
    from rtdm_tpu.export.autoshape import AutoShape
    from rtdm_tpu.export.detector import save_detector

    eng_dir = str(tmp_path / "eng")
    save_detector(tiny_detector, eng_dir)
    auto = AutoShape(eng_dir, names=["person", "vehicle"])
    im = np.random.default_rng(1).integers(
        0, 255, (120, 90, 3)).astype(np.uint8)
    res = auto(im)  # non-list input
    assert len(res) == 1 and res.xyxy[0].shape[1] == 6


def test_autoshape_matches_manual_pipeline(tiny_detector):
    """AutoShape output == letterbox + detector + un-letterbox by hand."""
    from rtdm_tpu.data.odder import letterbox_image
    from rtdm_tpu.export.autoshape import AutoShape

    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, (70, 130, 3)).astype(np.uint8)
    auto = AutoShape(tiny_detector)
    got = auto(im).xyxy[0]

    boxed, gain, (pw, ph) = letterbox_image(im, 96)
    det, cnt = tiny_detector(boxed[None])
    want = np.array(det[0][: int(cnt[0])], np.float32)
    if want.size:
        want[:, [0, 2]] = ((want[:, [0, 2]] - pw) / gain).clip(0, 130)
        want[:, [1, 3]] = ((want[:, [1, 3]] - ph) / gain).clip(0, 70)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape[0] > 0  # untrained net at conf 0.01 emits something


CLASSIFY_YAML = """
nc: 2
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10,13, 16,30, 33,23]
backbone:
  [[-1, 1, Conv, [16, 3, 2]],
   [-1, 1, Conv, [32, 3, 2]]]
head:
  [[-1, 1, Classify, [7]]]
"""


def test_classify_head_yaml():
    """Classify (common.py:385-395): GAP -> 1x1 conv -> flatten."""
    from rtdm_tpu.models.yolov5 import YoloV5

    model = YoloV5(yaml_text=CLASSIFY_YAML)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 7)

    # oracle: mean-pool the pre-head feature map, then the 1x1 conv
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    kernel = None
    bias = None
    for k, v in flat.items():
        if "m2" in k[0] and k[-1] == "kernel":
            kernel = np.asarray(v)
        if "m2" in k[0] and k[-1] == "bias":
            bias = np.asarray(v)
    assert kernel is not None and kernel.shape[:2] == (1, 1)

    # verify the algebra with an isolated Classify module
    from rtdm_tpu.models.yolov5 import Classify
    head = Classify(c2=4, k=1)
    feat = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 5, 6, 8)), jnp.float32)
    hv = head.init(jax.random.key(1), feat)
    got = np.asarray(head.apply(hv, feat))
    kw = np.asarray(hv["params"]["conv"]["kernel"])  # (1,1,8,4)
    bw = np.asarray(hv["params"]["conv"]["bias"])
    pooled = np.asarray(feat).mean(axis=(1, 2))  # (3, 8)
    want = pooled @ kw[0, 0] + bw
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_classify_multi_input_concat():
    """List input: per-input GAP concatenated on channels before the conv."""
    from rtdm_tpu.models.yolov5 import Classify

    head = Classify(c2=3, k=1)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(2, 4, 4, 5)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 8, 8, 6)), jnp.float32)
    hv = head.init(jax.random.key(2), [a, b])
    got = np.asarray(head.apply(hv, [a, b]))
    kw = np.asarray(hv["params"]["conv"]["kernel"])
    assert kw.shape == (1, 1, 11, 3)
    pooled = np.concatenate([np.asarray(a).mean(axis=(1, 2)),
                             np.asarray(b).mean(axis=(1, 2))], axis=1)
    want = pooled @ kw[0, 0] + np.asarray(hv["params"]["conv"]["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_summarize_detector(tmp_path):
    """Per-layer summary (model_info/profile=True analogue) lists every
    layer's output shape + params and the XLA-cost FLOPs."""
    from rtdm_tpu.utils.summary import summarize_detector

    cfg = tmp_path / "tiny.cfg"
    cfg.write_text(TINY_CFG)
    out = summarize_detector(str(cfg), img_size=96)
    assert "l0_conv" in out and "(1, 48, 48, 16)" in out
    assert "total params" in out and "forward FLOPs" in out
