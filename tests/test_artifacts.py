"""Committed-artifact integrity: every engine dir under artifacts/engines
must load and produce sane outputs with the CURRENT code (bit-rot guard
for the serialization formats, incl. sealed int8 archives)."""

import glob
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINES = os.path.join(REPO, "artifacts", "engines")


def _dirs():
    return sorted(d for d in glob.glob(os.path.join(ENGINES, "*"))
                  if os.path.isdir(d))


def test_artifacts_present():
    names = {os.path.basename(d) for d in _dirs()}
    assert {"squeeze-ernet_bf16", "squeeze-ernet_int8",
            "yolov4-tiny-mini_int8", "yolov5s-mini_int8"} <= names


@pytest.mark.parametrize("d", [d for d in _dirs()
                               if "yolo" not in os.path.basename(d)])
def test_classifier_engine_artifacts_load_and_run(d):
    from rtdm_tpu.export.engine import Engine

    eng = Engine.load(d)
    s = eng.spec.image_size
    frames = np.random.default_rng(0).integers(
        0, 255, (4, s, s, 3)).astype(np.uint8)
    probs = eng(frames)
    assert probs.shape == (4, eng.spec.num_classes)
    np.testing.assert_allclose(probs.sum(1), np.ones(4), rtol=1e-3)


@pytest.mark.parametrize("d", [d for d in _dirs()
                               if "yolo" in os.path.basename(d)])
def test_detector_engine_artifacts_parse(d):
    """Detector artifacts: spec + model DSL + sealed params reconstruct a
    runnable graph (full AOT compile at the stored batch is exercised by
    the engine round-trip tests; here batch-1 forward keeps it fast)."""
    import jax.numpy as jnp

    from rtdm_tpu.models.darknet import Darknet
    from rtdm_tpu.models.io import load_variables
    from rtdm_tpu.models.yolov5 import YoloV5

    with open(os.path.join(d, "spec.json")) as f:
        spec = json.load(f)
    assert spec.get("sealed") and spec["quant"] == "int8"
    with np.load(os.path.join(d, "params.npz")) as z:
        qk = [k for k in z.files if k.endswith("kernel.q")]
        assert qk and all(z[k].dtype == np.int8 for k in qk)
    assert os.path.exists(os.path.join(d, "act_scales.npz"))

    variables = load_variables(os.path.join(d, "params.npz"))
    with open(os.path.join(d, "model.txt")) as f:
        text = f.read()
    model = (YoloV5(yaml_text=text, num_classes=spec.get("num_classes"))
             if spec.get("family") == "yolov5"
             else Darknet(cfg_text=text))
    s = spec["img_size"]
    raw = model.apply(variables, jnp.zeros((1, s, s, 3), jnp.float32),
                      train=False)
    assert all(np.all(np.isfinite(np.asarray(r, np.float32)))
               for r in (raw if isinstance(raw, (list, tuple)) else [raw]))
