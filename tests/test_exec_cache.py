"""Serialized-executable engine artifacts (TRT deserialize analogue).

The reference deserializes .trt engines instead of rebuilding them
(tensorrt_inference/utils/yolo_with_plugins.py:269-272); these tests pin
the same property for our engine dirs: save writes exec.xla, load consumes
it without recompiling, and any content mismatch falls back to a rebuild.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.export.engine import Engine, build_engine
from rtdm_tpu.models import create_model

CFG = ("/root/reference/code/victim_localization/yolov3/cfg/"
       "yolov4-tiny-aider-416.cfg")


@pytest.fixture(scope="module")
def variables():
    model = create_model("squeeze-ernet")
    v = model.init(jax.random.key(0), jnp.zeros((1, 140, 140, 3)))
    return jax.device_get(v)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, (8, 140, 140, 3)).astype(np.uint8)


def test_engine_exec_fast_load(variables, frames, tmp_path):
    eng = build_engine("squeeze-ernet", variables, "fp32", 8)
    d = str(tmp_path / "eng")
    eng.save(d)
    assert os.path.exists(os.path.join(d, "exec.xla"))
    loaded = Engine.load(d)
    assert loaded.loaded_from_exec
    np.testing.assert_allclose(loaded(frames), eng(frames), rtol=1e-5)


def test_engine_exec_guard_on_weight_swap(variables, frames, tmp_path):
    eng = build_engine("squeeze-ernet", variables, "fp32", 8)
    d = str(tmp_path / "eng")
    eng.save(d)
    # swap the params out from under the exec artifact: the fingerprint
    # must reject the stale executable and recompile from the new weights
    swapped = jax.tree_util.tree_map(lambda x: x * 0.5, variables)
    eng2 = Engine(eng.spec, swapped)
    from rtdm_tpu.models.io import flatten_tree
    flat = flatten_tree(swapped)
    np.savez(os.path.join(d, "params.npz"),
             **{k: np.asarray(v) for k, v in flat.items()})
    loaded = Engine.load(d)
    assert not loaded.loaded_from_exec
    np.testing.assert_allclose(loaded(frames), eng2(frames), rtol=1e-5)


@pytest.mark.skipif(not os.path.exists(CFG), reason="reference cfg absent")
def test_detector_exec_fast_load(tmp_path):
    from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                          load_detector, save_detector)
    spec = DetectorSpec(cfg_name="v4t", img_size=416, conf_thres=0.3)
    det = build_detector(CFG, None, spec, batch_size=2)
    d = str(tmp_path / "det")
    save_detector(det, d)
    assert os.path.exists(os.path.join(d, "exec.xla"))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 416, 416, 3)).astype(np.uint8)
    boxes0, count0 = det(frames)

    loaded = load_detector(d)
    assert loaded.loaded_from_exec
    boxes1, count1 = loaded(frames)
    np.testing.assert_array_equal(count0, count1)
    np.testing.assert_allclose(boxes0, boxes1, rtol=1e-5, atol=1e-5)

    # spec overrides change the program -> exec artifact must be bypassed
    tuned = load_detector(d, spec_overrides={"conf_thres": 0.9})
    assert not tuned.loaded_from_exec
