"""Streaming runtime tests: frame sources, realtime CLI, cascade CLI,
profiler, experiment logging."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import REFERENCE_ROOT, needs_reference

IMAGES = REFERENCE_ROOT / \
    "code/victim_localization/yolov3/data/custom/test/images"


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (120, 160, 3),
                                     dtype=np.uint8)).save(d / f"f{i}.jpg")
    return str(d)


def test_frame_source_dir(image_dir):
    from rtdm_tpu.data.camera import FrameSource

    src = FrameSource.open(image_dir).start()
    frames = list(src)
    assert len(frames) == 5
    assert frames[0].shape == (120, 160, 3)
    assert src.frames_read == 5


def test_frame_source_single_image(image_dir):
    from rtdm_tpu.data.camera import FrameSource

    path = os.path.join(image_dir, "f0.jpg")
    src = FrameSource.open(path).start()
    assert len(list(src)) == 1


def test_multi_source_streams_file(image_dir, tmp_path):
    """LoadStreams analogue: a .streams file listing N sources yields all
    N sources' frames (round-robin interleave) behind the single-source
    interface."""
    from rtdm_tpu.data.camera import FrameSource

    streams = tmp_path / "cams.streams"
    streams.write_text(f"{image_dir}\n# comment line\n{image_dir}\n")
    src = FrameSource.open(str(streams)).start()
    frames = list(src)
    assert len(frames) == 10  # 5 images x 2 sources
    assert all(f.shape == (120, 160, 3) for f in frames)

    # list-of-uris form
    src2 = FrameSource.open([image_dir, image_dir, image_dir]).start()
    assert len(list(src2)) == 15


def test_frame_source_loop_and_resize(image_dir):
    """--video_looping / --do_resize analogues (reference camera.py:31-51):
    loop replays a finite source past its length; width/height resize every
    frame before the mailbox."""
    from rtdm_tpu.data.camera import FrameSource

    src = FrameSource.open(image_dir, loop=True, width=64,
                           height=48).start()
    frames = [src.read() for _ in range(12)]  # > 2x the 5-image dir
    src.stop()
    assert all(f is not None and f.shape == (48, 64, 3) for f in frames)

    # loop off: still ends at 5; resize alone applies
    src2 = FrameSource.open(image_dir, width=80, height=60).start()
    frames2 = list(src2)
    assert len(frames2) == 5
    assert frames2[0].shape == (60, 80, 3)


def test_frame_source_rejects_unknown():
    from rtdm_tpu.data.camera import FrameSource

    with pytest.raises(ValueError, match="unrecognized source"):
        FrameSource.open("definitely_not_a_source.xyz")


def test_realtime_inference_cli(image_dir, tmp_path, capsys):
    from rtdm_tpu.cli.realtime_inference import main
    import jax

    # random weights: save an npz so the CLI loads our own format
    import jax.numpy as jnp
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.io import save_variables

    model = create_model("squeeze-ernet")
    v = model.init(jax.random.key(0), jnp.zeros((1, 140, 140, 3)))
    wpath = str(tmp_path / "w.npz")
    save_variables(wpath, jax.device_get(v))

    n = main(["--source", image_dir, "--model", "squeeze-ernet",
              "--weights", wpath, "--batch", "2", "--power",
              "--save-dir", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert n == 5
    assert "FPS avg" in out and "energy/frame" in out
    assert os.path.exists(str(tmp_path / "out" / "frame_00004.jpg"))


@needs_reference
def test_cascade_stream_cli(tmp_path, capsys):
    from rtdm_tpu.cli.cascade_stream import main
    import jax
    import jax.numpy as jnp
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.io import save_variables

    model = create_model("squeeze-ernet")
    v = model.init(jax.random.key(0), jnp.zeros((1, 140, 140, 3)))
    wpath = str(tmp_path / "cls.npz")
    save_variables(wpath, jax.device_get(v))

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    results = main(["--source", str(IMAGES), "--det-cfg", cfg,
                    "--cls-model", "squeeze-ernet", "--cls-weights", wpath,
                    "--img-size", "224", "--quant", "fp32",
                    "--max-frames", "3"])
    out = capsys.readouterr().out
    assert len(results) == 3
    assert "cascade" in out
    scene, det = results[0]
    assert isinstance(scene, str) and det.shape[1] == 6


def test_profiler_energy_model():
    from rtdm_tpu.utils.profiler import PowerMonitor

    pm = PowerMonitor(chip_watts=100.0, idle_watts=10.0)
    pm.start()
    pm.record_busy(0.05)
    pm.record_busy(0.05)
    pm.stop()
    # 0.1s busy at 100W -> 10 J over frames
    np.testing.assert_allclose(pm.energy_per_frame(10), 1000.0, rtol=1e-6)
    assert pm.get_total_energy() > 0


def test_experiment_logger_jsonl(tmp_path):
    from rtdm_tpu.utils.experiment_log import ExperimentLogger

    log = ExperimentLogger(str(tmp_path), run_name="t",
                           use_tensorboard=False, config={"lr": 0.1})
    log.log_scalars(0, {"loss": 1.5})
    log.log_scalars(1, {"loss": 1.0})
    log.log_artifact(str(tmp_path / "model.npz"))
    log.close()
    lines = [json.loads(ln) for ln in
             open(tmp_path / "t.jsonl").read().splitlines()]
    events = [ln["event"] for ln in lines]
    assert events == ["config", "scalars", "scalars", "artifact"]
    assert lines[1]["loss"] == 1.5


def test_profiler_trace_smoke(tmp_path):
    """jax.profiler trace context produces a trace directory."""
    import jax.numpy as jnp
    from rtdm_tpu.utils.profiler import trace

    with trace(str(tmp_path / "tb")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    import glob
    assert glob.glob(str(tmp_path / "tb" / "**" / "*"), recursive=True)


def test_multi_source_slow_consumer_loses_nothing(image_dir, tmp_path):
    """End-of-stream with a lagging consumer: the sentinel must wait for
    the queue to drain, not evict a real frame (regression: the aggregate
    queue holds 2*N frames, so a consumer >4 frames behind at stream end
    lost one frame to the sentinel's drop-stale path)."""
    import time as _t
    from rtdm_tpu.data.camera import FrameSource

    streams = tmp_path / "cams.streams"
    streams.write_text(f"{image_dir}\n{image_dir}\n")
    src = FrameSource.open(str(streams)).start()
    _t.sleep(0.5)  # let the producer finish with the queue full
    frames = []
    while True:
        f = src.read()
        if f is None:
            break
        frames.append(f)
        _t.sleep(0.05)  # stay behind the producer the whole way
    assert len(frames) == 10


def test_multi_source_drops_stalled_live_child(image_dir):
    """A live camera that stops producing (connection alive, no frames)
    must be dropped after child_timeout and must NOT rate-limit healthy
    children: previously the round-robin blocked child_timeout on the
    stalled camera every cycle and never dropped it, so the aggregate
    stream both crawled and never terminated."""
    import time as _t

    import numpy as np

    from rtdm_tpu.data.camera import FrameSource, _MultiSource

    class StalledCam(FrameSource):
        def __init__(self):
            super().__init__("stalled://", live=True)

        def _produce(self):
            yield np.zeros((8, 8, 3), np.uint8)
            while not self._stop.wait(0.05):  # alive but frameless
                pass

    healthy = FrameSource.open(image_dir)  # 5 images
    src = _MultiSource([StalledCam(), healthy], child_timeout=0.6).start()

    t0 = _t.monotonic()
    frames = []
    while True:
        f = src.read(timeout=2.0)
        if f is None:
            break
        frames.append(f)
        assert len(frames) <= 6
    elapsed = _t.monotonic() - t0

    # all 5 healthy frames + the stalled camera's single frame
    assert len(frames) == 6
    # healthy frames were not serialized behind 5s blocks on the stalled
    # child, and the stalled child was dropped => the stream terminated
    assert elapsed < 5.0, elapsed
    src.stop()


# ---- GStreamer sources (tensorrt_inference/utils/camera.py modes) ----

def test_gst_pipeline_builders_match_reference_strings():
    """Pipeline strings must byte-match the reference's constructions
    (utils/camera.py:45-125) for each element-availability case."""
    from rtdm_tpu.data.camera import (gst_onboard_pipeline,
                                      gst_rtsp_pipeline, gst_usb_pipeline)

    rtsp_hw = gst_rtsp_pipeline("rtsp://cam/1", 640, 480, latency=200,
                                elements="... omxh264dec ...")
    assert rtsp_hw == (
        "rtspsrc location=rtsp://cam/1 latency=200 ! "
        "rtph264depay ! h264parse ! omxh264dec ! nvvidconv ! "
        "video/x-raw, width=(int)640, height=(int)480, "
        "format=(string)BGRx ! videoconvert ! appsink")
    rtsp_sw = gst_rtsp_pipeline("rtsp://cam/1", elements="avdec_h264")
    assert rtsp_sw == ("rtspsrc location=rtsp://cam/1 latency=200 ! "
                       "rtph264depay ! h264parse ! avdec_h264 ! "
                       "videoconvert ! appsink")
    with pytest.raises(RuntimeError, match="H.264 decoder"):
        gst_rtsp_pipeline("rtsp://cam/1", elements="")
    usb = gst_usb_pipeline(2, 640, 480)
    assert usb == ("v4l2src device=/dev/video2 ! "
                   "video/x-raw, width=(int)640, height=(int)480 ! "
                   "videoconvert ! appsink")
    onb = gst_onboard_pipeline(1280, 720, elements="nvarguscamerasrc")
    assert "nvarguscamerasrc" in onb and "flip-method=2" in onb
    assert "width=(int)1280, height=(int)720" in onb
    onb_old = gst_onboard_pipeline(elements="nvcamerasrc x")
    assert onb_old.startswith("nvcamerasrc ! ")
    with pytest.raises(RuntimeError, match="onboard"):
        gst_onboard_pipeline(elements="")


def test_gst_source_stubbed_capture(monkeypatch):
    """FrameSource.open on a raw pipeline string routes to
    cv2.VideoCapture(str, CAP_GSTREAMER) (open_cam_gstr semantics) and
    streams RGB frames from the threaded mailbox."""
    import cv2 as _cv2

    from rtdm_tpu.data import camera as cam_mod
    from rtdm_tpu.data.camera import FrameSource, is_gst_pipeline

    calls = {}

    class FakeCap:
        def __init__(self, uri, backend=None):
            calls["uri"], calls["backend"] = uri, backend
            self.n = 0

        def isOpened(self):
            return True

        def read(self):
            self.n += 1
            if self.n > 3:
                return False, None
            bgr = np.zeros((8, 8, 3), np.uint8)
            bgr[:, :, 0] = 255  # blue in BGR -> must come out RGB
            return True, bgr

        def release(self):
            calls["released"] = True

    monkeypatch.setattr(_cv2, "VideoCapture", FakeCap)
    pipe = ("videotestsrc ! video/x-raw, width=(int){width}, "
            "height=(int){height} ! videoconvert ! appsink")
    assert is_gst_pipeline(pipe)
    src = FrameSource.open(pipe, width=320, height=240).start()
    frames = [f for f in src]
    src.stop()
    # {width}/{height} formatted INTO the pipeline, not host-resized
    assert "width=(int)320" in calls["uri"]
    assert calls["backend"] == _cv2.CAP_GSTREAMER
    assert src.resize is None
    assert len(frames) >= 1  # live mailbox may drop, never dup
    assert frames[0][0, 0, 2] == 255 and frames[0][0, 0, 0] == 0
    assert calls.get("released")


def test_gst_onboard_alias(monkeypatch):
    """source='onboard' builds the Jetson pipeline then opens it."""
    from rtdm_tpu.data import camera as cam_mod
    from rtdm_tpu.data.camera import FrameSource

    monkeypatch.setattr(cam_mod, "_gst_elements",
                        lambda: "nvarguscamerasrc")
    src = FrameSource.open("onboard")
    assert type(src).__name__ == "_GstSource"
    assert src.uri.startswith("nvarguscamerasrc ! ")
