"""Engine build / save / load / quantization tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.export.engine import Engine, EngineSpec, build_engine
from rtdm_tpu.models import create_model


@pytest.fixture(scope="module")
def variables():
    model = create_model("squeeze-ernet")
    v = model.init(jax.random.key(0), jnp.zeros((1, 140, 140, 3)))
    return jax.device_get(v)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(42)
    return rng.integers(0, 255, (16, 140, 140, 3)).astype(np.uint8)


def test_build_and_run_fp32(variables, frames):
    eng = build_engine("squeeze-ernet", variables, quant="fp32",
                       batch_size=16)
    out = eng(frames)
    assert out.shape == (16, 5)
    np.testing.assert_allclose(out.sum(1), np.ones(16), rtol=1e-5)


def test_batch_padding_and_overflow(variables, frames):
    eng = build_engine("squeeze-ernet", variables, quant="fp32",
                       batch_size=16)
    small = eng(frames[:3])
    assert small.shape == (3, 5)
    np.testing.assert_allclose(small, eng(frames)[:3], rtol=1e-5)
    with pytest.raises(ValueError, match="exceeds engine max batch"):
        eng(np.zeros((17, 140, 140, 3), np.uint8))


def test_bf16_close_to_fp32(variables, frames):
    e32 = build_engine("squeeze-ernet", variables, "fp32", 16)
    e16 = build_engine("squeeze-ernet", variables, "bf16", 16)
    a, b = e32(frames), e16(frames)
    assert np.mean(np.argmax(a, 1) == np.argmax(b, 1)) >= 0.9


def test_save_load_roundtrip(variables, frames, tmp_path):
    eng = build_engine("squeeze-ernet", variables, "fp32", 16)
    eng.save(str(tmp_path / "eng"))
    loaded = Engine.load(str(tmp_path / "eng"))
    np.testing.assert_allclose(loaded(frames), eng(frames), rtol=1e-5)
    assert loaded.spec.quant == "fp32"


def test_int8_engine(variables, frames):
    eng8 = build_engine("squeeze-ernet", variables, "int8", 16,
                        calib_images=frames)
    e32 = build_engine("squeeze-ernet", variables, "fp32", 16)
    out8, out32 = eng8(frames), e32(frames)
    assert out8.shape == (16, 5)
    assert np.all(np.isfinite(out8))
    # int8 QDQ should track fp32 closely on the same distribution
    assert np.mean(np.argmax(out8, 1) == np.argmax(out32, 1)) >= 0.8


def test_int8_requires_calibration(variables):
    with pytest.raises(ValueError, match="calib_images"):
        build_engine("squeeze-ernet", variables, "int8", 8)


def test_calibration_scales_shapes(variables, frames):
    from rtdm_tpu.quant.calibrate import calibrate_classifier
    model = create_model("squeeze-ernet")
    scales = calibrate_classifier(model, variables, frames[:8])
    # every Conv/DepthwiseConv/Dense input observed: conv1 + 4 ACFFs x
    # (3 dw + 1 fuse) + head conv2 + fc = 19
    assert len(scales) == 19
    assert all(float(s) > 0 for s in scales.values())


def test_entropy_calibration():
    from rtdm_tpu.quant.calibrate import compute_scale
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 100_000).astype(np.float32)
    x[:10] = 50.0  # outliers
    s_pct = compute_scale(x, "percentile")
    s_ent = compute_scale(x, "entropy")
    # both should clip the outliers: threshold well below 50
    assert s_pct * 127 < 10
    assert s_ent * 127 < 10


def test_real_int8_forward_matches_fp32(variables, frames):
    """True-int8 MXU path (quant/int8.py int8_classifier_forward) tracks
    fp32 closely and is QDQ-level accurate."""
    import jax
    import jax.numpy as jnp

    from rtdm_tpu.data.aider import normalize_batch
    from rtdm_tpu.models import create_model
    from rtdm_tpu.quant.calibrate import calibrate_classifier
    from rtdm_tpu.quant.int8 import int8_classifier_forward

    model = create_model("squeeze-ernet")
    scales = calibrate_classifier(model, variables, frames[:8])
    fwd8 = int8_classifier_forward(model, variables, scales)
    f = jax.jit(lambda u8: fwd8(normalize_batch(u8)))
    got = np.asarray(f(jnp.asarray(frames)))
    # retrace at a different batch must not leak tracers
    got2 = np.asarray(f(jnp.asarray(frames[:4])))
    fp32 = np.asarray(model.apply(
        variables, normalize_batch(jnp.asarray(frames)), train=False))
    assert got.shape == (16, 5) and got2.shape == (4, 5)
    assert np.mean(got.argmax(1) == fp32.argmax(1)) >= 0.9
    np.testing.assert_allclose(got.sum(1), np.ones(16), rtol=1e-4)


def test_detector_engine_save_load(tmp_path):
    """Detection engine roundtrip (engines/*.trt analogue)."""
    import jax
    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                          load_detector, save_detector)

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    spec = DetectorSpec(cfg_name="tiny", img_size=224, conf_thres=0.3,
                        quant="fp32")
    det = build_detector(cfg, None, spec, batch_size=2)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 224, 224, 3)).astype(np.uint8)
    d1, c1 = det(frames)
    save_detector(det, str(tmp_path / "deteng"))
    det2 = load_detector(str(tmp_path / "deteng"))
    d2, c2 = det2(frames)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)
    assert det2.spec.conf_thres == 0.3 and det2.spec.img_size == 224
    # nc rides along so CLIs can pick default class names (get_cls_dict)
    assert det.num_classes == 2 and det2.num_classes == 2
    # run-time NMS shaping overrides the baked spec (TrtYOLO takes
    # conf_thres at construction, trt_yolo.py:38-40) — yolo_detect
    # --engine --classes/--max-det must not be silently dropped
    det3 = load_detector(str(tmp_path / "deteng"),
                         spec_overrides={"conf_thres": 0.9, "max_det": 7,
                                         "classes": (0,)})
    assert det3.spec.conf_thres == 0.9 and det3.spec.max_det == 7
    d3, c3 = det3(frames)
    assert d3.shape[1] == 7
    for i in range(2):
        assert int(c3[i]) <= 7
        kept = np.asarray(d3[i][:int(c3[i])])
        assert np.all(kept[:, 4] >= 0.9) and np.all(kept[:, 5] == 0)


def test_int8_detector_calibrated_engine(tmp_path):
    """int8 detector engines carry calibrated activation scales
    (onnx_to_tensorrt.py:97-103 + calibrator.py analogue): calibration
    runs, scales persist through save/load, and the QDQ forward stays
    close to the bf16 one on the calibration distribution."""
    import jax
    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                          load_detector, save_detector)

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 224, 224, 3)).astype(np.uint8)

    spec8 = DetectorSpec(cfg_name="tiny", img_size=224, conf_thres=0.3,
                         quant="int8")
    with pytest.raises(ValueError):
        build_detector(cfg, None, spec8, batch_size=2)  # needs calib
    det8 = build_detector(cfg, None, spec8, batch_size=2,
                          calib_images=frames)
    assert det8.act_scales and all(v > 0 for v in det8.act_scales.values())
    # every conv input in the tiny graph got a scale
    assert len(det8.act_scales) >= 10

    d8, c8 = det8(frames[:2])
    save_detector(det8, str(tmp_path / "int8eng"))
    assert (tmp_path / "int8eng" / "act_scales.npz").exists()
    det8b = load_detector(str(tmp_path / "int8eng"))
    assert det8b.act_scales == det8.act_scales
    d8b, c8b = det8b(frames[:2])
    np.testing.assert_array_equal(c8, c8b)
    np.testing.assert_allclose(d8, d8b, rtol=1e-5, atol=1e-5)

    # act-QDQ must actually change the numerics vs weight-only QDQ
    det8_noact = build_detector(
        cfg, None, DetectorSpec(cfg_name="tiny", img_size=224,
                                conf_thres=0.3, quant="bf16"),
        batch_size=2)
    db, _ = det8_noact(frames[:2])
    assert not np.allclose(np.asarray(d8), np.asarray(db))


def test_sealed_int8_detector_engine(tmp_path):
    """Sealed int8 engines (int8 weight codes + scales, BN folded — the
    .trt-file analogue) must reload to the live engine's exact numerics
    (weight QDQ is idempotent) at ~4x smaller params.npz."""
    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                          load_detector, save_detector)

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 224, 224, 3)).astype(np.uint8)
    det8 = build_detector(
        cfg, None, DetectorSpec(cfg_name="tiny", img_size=224,
                                conf_thres=0.3, quant="int8"),
        batch_size=2, calib_images=frames)
    d0, c0 = det8(frames[:2])

    save_detector(det8, str(tmp_path / "plain"))
    save_detector(det8, str(tmp_path / "sealed"), sealed=True)
    plain_sz = (tmp_path / "plain" / "params.npz").stat().st_size
    sealed_sz = (tmp_path / "sealed" / "params.npz").stat().st_size
    assert sealed_sz < plain_sz / 2.5
    # the sealed archive actually stores int8 codes
    with np.load(tmp_path / "sealed" / "params.npz") as z:
        qkeys = [k for k in z.files if k.endswith("kernel.q")]
        assert qkeys and all(z[k].dtype == np.int8 for k in qkeys)
        # BN folded: no bn leaves remain
        assert not any("_bn/" in k for k in z.files)

    det_s = load_detector(str(tmp_path / "sealed"))
    ds, cs = det_s(frames[:2])
    np.testing.assert_array_equal(c0, cs)
    np.testing.assert_allclose(d0, ds, rtol=1e-5, atol=1e-5)

    # sealing a non-int8 engine must refuse
    det_b = build_detector(
        cfg, None, DetectorSpec(cfg_name="tiny", img_size=224,
                                conf_thres=0.3, quant="bf16"),
        batch_size=2)
    with pytest.raises(ValueError, match="sealed"):
        save_detector(det_b, str(tmp_path / "nope"), sealed=True)


def test_sealed_int8_yolov5_engine(tmp_path):
    """Sealed save for v5 graphs: no darknet BN fold (BN leaves stay),
    kernels stored int8; reload matches the live engine."""
    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                          load_detector, save_detector)

    yml = str(REFERENCE_ROOT /
              "code/victim_localization/yolov5/models/yolov5s.yaml")
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (4, 224, 224, 3)).astype(np.uint8)
    det8 = build_detector(
        yml, None, DetectorSpec(cfg_name="v5s", img_size=224,
                                conf_thres=0.3, quant="int8"),
        batch_size=2, num_classes=2, calib_images=frames)
    d0, c0 = det8(frames[:2])
    save_detector(det8, str(tmp_path / "v5sealed"), sealed=True)
    with np.load(tmp_path / "v5sealed" / "params.npz") as z:
        assert any(k.endswith("kernel.q") for k in z.files)
        assert any("batch_stats" in k for k in z.files)  # BN kept (no fold)
    det_s = load_detector(str(tmp_path / "v5sealed"))
    ds, cs = det_s(frames[:2])
    np.testing.assert_array_equal(c0, cs)
    np.testing.assert_allclose(d0, ds, rtol=1e-5, atol=1e-5)


def test_entropy_calibration_reachable():
    """--calib-method entropy must thread through to compute_scale."""
    from rtdm_tpu.quant.calibrate import compute_scale

    rng = np.random.default_rng(1)
    vals = np.concatenate([rng.normal(0, 1, 100_000),
                           rng.normal(0, 8, 50)])  # outlier tail
    s_pct = compute_scale(vals, "percentile")
    s_ent = compute_scale(vals, "entropy")
    assert s_pct > 0 and s_ent > 0 and s_pct != s_ent
    # both should clip the outlier tail well below absmax/127
    assert s_ent < np.abs(vals).max() / 127.0


def test_detector_fuse_parity():
    """BN folding at engine-compile time (Darknet.fuse(), models.py:397-412)
    must preserve the detector's outputs."""
    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from rtdm_tpu.export.detector import DetectorSpec, build_detector

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 224, 224, 3)).astype(np.uint8)
    base = dict(cfg_name="tiny", img_size=224, conf_thres=0.3, quant="fp32")
    det_f = build_detector(cfg, None, DetectorSpec(**base, fuse=True),
                           batch_size=2)
    det_u = build_detector(cfg, None, DetectorSpec(**base, fuse=False),
                           batch_size=2)
    df, cf = det_f(frames)
    du, cu = det_u(frames)
    np.testing.assert_array_equal(cf, cu)
    np.testing.assert_allclose(df, du, rtol=1e-3, atol=1e-3)


def test_batch_int8_engine_builder(tmp_path):
    """build_int8_engines.sh analogue: one invocation builds calibrated
    int8 engine dirs named <stem>-int8-<size> for every cfg."""
    from PIL import Image
    from rtdm_tpu.cli.build_int8_engines import main as batch_main
    from rtdm_tpu.export.detector import load_detector

    tiny_cfg = """
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
    cfg_a = tmp_path / "modela.cfg"
    cfg_b = tmp_path / "modelb.cfg"
    cfg_a.write_text(tiny_cfg)
    cfg_b.write_text(tiny_cfg)
    calib = tmp_path / "calib"
    calib.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 80, 3)).astype(
            np.uint8)).save(calib / f"c{i}.jpg")

    # up-front existence check aborts before building anything
    with pytest.raises(SystemExit, match="cannot find cfg"):
        batch_main(["--cfgs", str(tmp_path / "nope.cfg"),
                    "--calib-dir", str(calib), "--allow-random",
                    "--output", str(tmp_path / "engines")])
    # missing weights without --allow-random aborts
    with pytest.raises(SystemExit, match="no weights"):
        batch_main(["--cfgs", str(cfg_a), "--weights-dir", str(tmp_path),
                    "--calib-dir", str(calib),
                    "--output", str(tmp_path / "engines")])

    out = batch_main(["--cfgs", str(cfg_a), str(cfg_b),
                      "--img-size", "96", "--batch-size", "2",
                      "--calib-dir", str(calib), "--calib-method",
                      "entropy", "--allow-random",
                      "--output", str(tmp_path / "engines")])
    assert [os.path.basename(o) for o in out] == [
        "modela-int8-96", "modelb-int8-96"]
    det = load_detector(out[0])
    assert det.spec.quant == "int8" and det.act_scales
    d, c = det(rng.integers(0, 255, (2, 96, 96, 3)).astype(np.uint8))
    assert d.shape[0] == 2


def test_engine_nondefault_class_count(tmp_path, frames):
    """A checkpoint trained with a non-default class count must engine
    cleanly: num_classes is inferred from the fc head and survives the
    save/load round-trip (previously create_model rebuilt the registry
    default 5-class head and apply crashed on shape mismatch)."""
    model7 = create_model("squeeze-ernet", num_classes=7)
    v7 = jax.device_get(model7.init(jax.random.key(1),
                                    jnp.zeros((1, 140, 140, 3))))
    eng = build_engine("squeeze-ernet", v7, quant="fp32", batch_size=4)
    assert eng.spec.num_classes == 7
    out = eng(frames[:4])
    assert out.shape == (4, 7)
    np.testing.assert_allclose(out.sum(1), 1.0, rtol=1e-4)
    d = eng.save(str(tmp_path / "e7"))
    out2 = Engine.load(d)(frames[:4])
    np.testing.assert_allclose(out2, out, rtol=2e-5, atol=2e-6)


def test_int8_engine_respects_with_softmax(variables, frames):
    """spec.with_softmax=False must yield LOGITS from int8 engines too —
    the int8 branch used to ignore it and always softmax."""
    from rtdm_tpu.quant.calibrate import calibrate_classifier

    model = create_model("squeeze-ernet")
    scales = calibrate_classifier(model, variables, frames[:8])
    spec = EngineSpec(model="squeeze-ernet", quant="int8", batch_size=8,
                      image_size=140, with_softmax=False)
    eng = Engine(spec, variables, act_scales=scales)
    out = eng(frames[:8])
    # logits: rows must NOT be a probability simplex
    assert not np.allclose(out.sum(1), 1.0, atol=1e-3)
    assert np.any(out < 0)


def test_detector_spec_quant_normalized_and_validated():
    from rtdm_tpu.export.detector import DetectorSpec

    assert DetectorSpec(cfg_name="x", quant="FP16").quant == "bf16"
    assert DetectorSpec(cfg_name="x", quant="half").quant == "bf16"
    assert DetectorSpec(cfg_name="x", quant="INT8").quant == "int8"
    with pytest.raises(ValueError, match="unknown detector quant"):
        DetectorSpec(cfg_name="x", quant="bf-16")


def test_training_config_save_bare_filename(tmp_path, monkeypatch):
    from rtdm_tpu.core.config import TrainingConfig

    monkeypatch.chdir(tmp_path)
    p = TrainingConfig().save("config.json")  # used to raise makedirs('')
    assert os.path.exists(p)


def test_load_detector_batch_override(tmp_path, rng):
    """load_detector(batch_size=1) recompiles the engine for per-frame
    loops instead of padding every frame to the build batch (a batch-256
    engine ran 256 rows per webcam frame); the exec fast path only applies
    when the stored batch is kept."""
    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                          load_detector, save_detector)

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    spec = DetectorSpec(cfg_name="tiny", img_size=224, conf_thres=0.3,
                        quant="fp32")
    det = build_detector(cfg, None, spec, batch_size=4)
    d = save_detector(det, str(tmp_path / "eng"))

    one = load_detector(d, batch_size=1)
    assert one.batch_size == 1
    frame = rng.integers(0, 255, (1, 224, 224, 3)).astype(np.uint8)
    dets, cnt = one(frame)
    assert dets.shape[0] == 1

    # stored batch keeps the serialized-exec fast path eligible
    full = load_detector(d)
    assert full.batch_size == 4
