"""Serving layer: MicroBatcher semantics + HTTP server end-to-end.

The batcher is exercised with a fake engine (numpy, deterministic row
transform) so coalescing, row-alignment, error propagation, and shutdown
draining are pinned without device compiles; the HTTP test drives a real
(tiny) classifier engine through POST /v1/classify.
"""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from rtdm_tpu.serve import MicroBatcher


def test_batcher_row_alignment_under_load():
    calls = []

    def dispatch(frames):
        calls.append(frames.shape[0])
        time.sleep(0.01)  # force queue buildup -> coalescing
        return frames.astype(np.float32).sum(axis=(1, 2, 3), keepdims=False)

    mb = MicroBatcher(dispatch, batch_size=8, max_wait_ms=20.0)
    frames = [np.full((4, 4, 3), i, np.uint8) for i in range(25)]
    futs = [mb.submit(f) for f in frames]
    got = [f.result(timeout=30) for f in futs]
    mb.close()
    want = [f.astype(np.float32).sum() for f in frames]
    np.testing.assert_allclose(got, want)
    stats = mb.stats()
    assert stats.requests == 25
    assert stats.batches == len(calls)
    assert max(calls) > 1  # coalescing actually happened
    assert all(c <= 8 for c in calls)
    assert stats.p99_ms >= stats.p50_ms > 0


def test_batcher_tuple_outputs_align_rows():
    def dispatch(frames):
        n = frames.shape[0]
        return (frames.astype(np.float32) * 2.0,
                np.arange(n, dtype=np.int32))

    mb = MicroBatcher(dispatch, batch_size=4, max_wait_ms=5.0)
    futs = [mb.submit(np.full((2, 2, 3), i, np.uint8)) for i in range(6)]
    for i, fut in enumerate(futs):
        arr, idx = fut.result(timeout=30)
        np.testing.assert_array_equal(arr, np.full((2, 2, 3), 2.0 * i))
        assert 0 <= idx < 4
    mb.close()


def test_batcher_propagates_engine_errors():
    def dispatch(frames):
        raise RuntimeError("engine on fire")

    mb = MicroBatcher(dispatch, batch_size=4, max_wait_ms=1.0)
    fut = mb.submit(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(RuntimeError, match="engine on fire"):
        fut.result(timeout=30)
    mb.close()


def test_batcher_drains_on_close():
    def dispatch(frames):
        time.sleep(0.02)
        return frames.astype(np.float32)

    mb = MicroBatcher(dispatch, batch_size=4, max_wait_ms=1.0, depth=2)
    futs = [mb.submit(np.full((1,), i, np.uint8)) for i in range(8)]
    mb.close()
    done = [f for f in futs if f.done()]
    assert len(done) == 8  # every future resolved (result or exception)
    resolved = [f for f in futs if f.exception() is None]
    for f in resolved:
        assert f.result().shape == (1,)
    assert resolved, "close() must flush at least the in-flight work"


def test_batcher_resolves_last_batch_when_idle():
    """A quiet server must not hold the final in-flight batch hostage."""
    def dispatch(frames):
        return frames.astype(np.float32)

    mb = MicroBatcher(dispatch, batch_size=8, max_wait_ms=1.0, depth=2)
    t0 = time.perf_counter()
    out = mb(np.ones((2, 2, 3), np.uint8), timeout=10)
    dt = time.perf_counter() - t0
    mb.close()
    assert out.shape == (2, 2, 3)
    assert dt < 5.0


@pytest.fixture(scope="module")
def classify_server(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from rtdm_tpu.cli.serve import _ClassifyService, make_server
    from rtdm_tpu.export.engine import build_engine
    from rtdm_tpu.models import create_model

    model = create_model("squeeze-ernet")
    v = jax.device_get(model.init(jax.random.key(0),
                                  jnp.zeros((1, 140, 140, 3))))
    eng = build_engine("squeeze-ernet", v, "fp32", 4)
    d = str(tmp_path_factory.mktemp("serve") / "eng")
    eng.save(d)
    svc = _ClassifyService(d, max_wait_ms=5.0, depth=2)
    server = make_server(0, svc, None)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    svc.batcher.close()


def _jpeg_bytes(rng) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
                    ).save(buf, format="JPEG")
    return buf.getvalue()


def test_http_classify_end_to_end(classify_server, rng):
    body = _jpeg_bytes(rng)
    # health
    with urllib.request.urlopen(classify_server + "/healthz") as r:
        assert json.load(r)["ok"] is True
    # concurrent classify requests (coalesced into engine batches)
    results = []

    def hit():
        req = urllib.request.Request(classify_server + "/v1/classify",
                                     data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            results.append(json.load(r))

    threads = [threading.Thread(target=hit) for _ in range(6)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(results) == 6
    first = results[0]
    assert set(first) == {"label", "confidence", "probs"}
    assert abs(sum(first["probs"].values()) - 1.0) < 1e-3
    for r in results[1:]:  # same image -> same answer
        assert r["label"] == first["label"]
    with urllib.request.urlopen(classify_server + "/stats") as r:
        stats = json.load(r)["classify"]
    assert stats["requests"] >= 6


def test_http_bad_body_is_a_client_error(classify_server):
    req = urllib.request.Request(classify_server + "/v1/classify",
                                 data=b"not an image", method="POST")
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
        assert "error" in json.load(e)
    assert raised


def test_http_batcher_timeout_is_retryable_503():
    """A batcher-future timeout (server still compiling its first dispatch,
    or overloaded) must surface as retryable 503, not 400 — observed live:
    the first requests of a TPU-backed load test time out against the
    ~1-min first-dispatch XLA compile (serve.py:do_POST)."""
    from rtdm_tpu.cli.serve import make_server

    class _SlowService:
        def __call__(self, body: bytes):
            raise TimeoutError("future timed out")

    server = make_server(0, _SlowService(), None)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/v1/classify"
        req = urllib.request.Request(url, data=b"x", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 503
        payload = json.load(ei.value)
        assert payload["retryable"] is True
        assert "TimeoutError" in payload["error"]
    finally:
        server.shutdown()


def test_detections_to_json_unletterboxes_exactly():
    """Boxes in letterbox space map back to original pixels with the same
    gain/pad the letterbox applied (scale_coords semantics)."""
    from rtdm_tpu.cli.serve import detections_to_json
    from rtdm_tpu.data.odder import letterbox_image
    img = np.zeros((300, 400, 3), np.uint8)  # oh=300, ow=400
    _, gain, pads = letterbox_image(img, 416)
    # a box covering orig pixels (40,30)-(200,150), mapped INTO letterbox
    x1, y1, x2, y2 = (40 * gain + pads[0], 30 * gain + pads[1],
                      200 * gain + pads[0], 150 * gain + pads[1])
    det = np.zeros((10, 6), np.float32)
    det[0] = [x1, y1, x2, y2, 0.9, 1]
    out = detections_to_json(det, 1, gain, pads, (300, 400),
                             ["person", "vehicle"])
    assert out["count"] == 1
    d = out["detections"][0]
    np.testing.assert_allclose(d["box"], [40, 30, 200, 150], atol=1e-3)
    assert d["name"] == "vehicle" and abs(d["conf"] - 0.9) < 1e-6
    # clipping: a box poking past the original frame is clamped
    det[1] = [0.0, 0.0, 416.0, 416.0, 0.5, 0]
    out2 = detections_to_json(det, 2, gain, pads, (300, 400), ["p", "v"])
    assert out2["detections"][1]["box"] == [0.0, 0.0, 400.0, 300.0]


def test_serve_load_concurrent_clients(classify_server):
    """Load test (cli/serve_loadtest): 12 closed-loop clients x 6
    requests against the live HTTP server. All requests must succeed,
    the micro-batcher must actually coalesce (mean batch > 1 under
    concurrency), and client-observed p99 must stay bounded."""
    from rtdm_tpu.cli.serve_loadtest import run_load

    res = run_load(classify_server, "/v1/classify", clients=12,
                   requests_per_client=6, timeout=120.0)
    print("serve_load:", json.dumps(res))  # calibration data in CI logs
    assert res["errors"] == 0, res.get("first_error")
    assert res["requests"] == 72
    assert res["server_mean_batch"] > 1.0, res  # coalescing happened
    assert res["p50_ms"] > 0 and res["p99_ms"] >= res["p50_ms"]
    # calibrated envelope: measured p99 on this 1-vCPU CI host is ~2.2 s
    # (XLA CPU classifier, 12 concurrent clients, host under load); 10 s
    # is a ~4-5x jitter envelope that still fails on a wedged batcher
    # (the TPU-backed numbers live in docs/DESIGN.md "Serving under load")
    assert res["p99_ms"] < 10_000


def test_native_classify_frame_matches_pil_preprocess():
    """The native decode fast path reproduces aider_predict.preprocess
    geometry on a real aerial JPEG: same shape, content aligned to ~1 px
    (resize kernels differ: libjpeg DCT-prescale + INTER_LINEAR vs PIL
    antialiased BILINEAR)."""
    import glob
    from rtdm_tpu.cli.serve import _native_classify_frame
    from rtdm_tpu.cli.aider_predict import preprocess
    from rtdm_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native IO unavailable")
    path = sorted(glob.glob(
        "/root/reference/code/victim_localization/yolov3/data/custom/"
        "test/images/*.jpg"))[0]
    body = open(path, "rb").read()
    got = _native_classify_frame(body, 140)
    assert got is not None and got.shape == (140, 140, 3)
    from rtdm_tpu.cli.serve import _decode_image
    want = preprocess(_decode_image(body), 140)[0]
    # interior crop dodges the <=1 px border alignment slack
    d = (got[2:-2, 2:-2].astype(np.float32)
         - want[2:-2, 2:-2].astype(np.float32))
    assert np.abs(d).mean() < 8.0, np.abs(d).mean()


def test_native_classify_frame_falls_back_on_non_jpeg(rng):
    from rtdm_tpu.cli.serve import _native_classify_frame
    buf = io.BytesIO()
    from PIL import Image
    Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
                    ).save(buf, format="PNG")
    assert _native_classify_frame(buf.getvalue(), 140) is None


def test_native_vs_pil_argmax_engine_parity_on_real_jpegs():
    """Engine-level agreement check for the serve fast path (round-4
    advisor finding): the native libjpeg DCT-prescale + INTER_LINEAR
    preprocess must produce the SAME argmax as the eval-validated PIL
    antialiased path through a TRAINED squeeze-ernet engine, on every
    real aerial JPEG in the bundled mini-set — a pixel-diff bound alone
    cannot rule out borderline prediction flips."""
    import glob
    from rtdm_tpu.cli.aider_predict import preprocess
    from rtdm_tpu.cli.serve import _decode_image, _native_classify_frame
    from rtdm_tpu.data import native_io
    from rtdm_tpu.export.engine import Engine, EngineSpec

    if not native_io.available():
        pytest.skip("native IO unavailable")
    paths = sorted(glob.glob(
        "/root/reference/code/victim_localization/yolov3/data/custom/"
        "test/images/*.jpg"))
    if not paths:
        pytest.skip("reference mini-set unavailable")
    try:
        from rtdm_tpu.models.torch_import import load_classifier_checkpoint
        variables = load_classifier_checkpoint(
            "/root/reference/code/disaster_detection/weights/"
            "squeeze-ernet-state_dict.pt")
    except Exception:
        pytest.skip("reference checkpoint unavailable")
    native, pil = [], []
    for p in paths:
        body = open(p, "rb").read()
        f = _native_classify_frame(body, 140)
        assert f is not None, p
        native.append(f)
        pil.append(preprocess(_decode_image(body), 140)[0])
    eng = Engine(EngineSpec(model="squeeze-ernet", quant="fp32",
                            batch_size=len(paths), image_size=140),
                 variables)
    probs_native = eng(np.stack(native))
    probs_pil = eng(np.stack(pil))
    agree = (probs_native.argmax(1) == probs_pil.argmax(1))
    flips = [(paths[i], probs_native[i].round(3).tolist(),
              probs_pil[i].round(3).tolist())
             for i in np.where(~agree)[0]]
    assert agree.all(), f"argmax flips on {flips}"
    # confidence through the two paths stays close on real photos
    assert np.abs(probs_native - probs_pil).max() < 0.08
