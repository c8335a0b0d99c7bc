"""rtdm-serve — micro-batching HTTP inference server over saved engines.

Beyond-reference serving front end (the reference's deployment loops are
local-display only: real-time-inference.py, trt_yolo.py). Concurrent
single-image requests are coalesced into the engine's fixed batch shape by
`serve.MicroBatcher`, with double-buffered device dispatch.

Endpoints (body = raw JPEG/PNG bytes):
  POST /v1/classify  -> {"label", "confidence", "probs"}
  POST /v1/detect    -> {"count", "detections": [{"box" (orig px), "conf",
                         "cls", "name"}]}
  GET  /healthz      -> {"ok": true, ...}
  GET  /stats        -> per-batcher request/batch/latency stats

Usage:
  python -m rtdm_tpu.cli.serve --engine engines/se-bf16 \
      [--detector engines/v4t-int8] [--port 8000] [--max-wait-ms 2]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from rtdm_tpu.models.ernet import CLASS_NAMES


def _decode_image(body: bytes) -> np.ndarray:
    """Image bytes -> RGB HWC uint8 (PIL fallback path; the hot path is
    the native decode below — serving this box is host-bound on exactly
    this per-request work, measured in DESIGN.md's serve load test)."""
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"), np.uint8)


def _peek_dims(body: bytes):
    """Image dims from the header only (PIL lazy open — no pixel decode)."""
    from PIL import Image
    try:
        with Image.open(io.BytesIO(body)) as im:
            return im.size  # (w, h)
    except Exception:
        return None


def _native_classify_frame(body: bytes, size: int):
    """JPEG bytes -> (size,size,3) u8 eval frame via the native libjpeg
    DCT-prescale decoder (1.9-3.1x PIL, data/native_io.py), reproducing
    aider_predict.preprocess geometry: resize shorter side to 1.14*size,
    center crop. The aspect-exact rect letterbox degenerates to a plain
    resize (<=1 px of pad at the borders, removed by the >=9 px crop
    margin). Returns None for non-JPEG/odd inputs -> PIL fallback."""
    from rtdm_tpu.data import native_io
    if not native_io.available():
        return None
    wh = _peek_dims(body)
    if wh is None:
        return None
    w, h = wh
    target = int(size * 1.14)
    if w <= h:
        nw, nh = target, max(int(round(h * target / w)), target)
    else:
        nh, nw = target, max(int(round(w * target / h)), target)
    res = native_io.decode_jpeg_letterbox_rect(body, nh, nw)
    if res is None:
        return None
    frame = res[0]
    left, top = (nw - size) // 2, (nh - size) // 2
    return np.ascontiguousarray(frame[top:top + size, left:left + size])


class _ClassifyService:
    def __init__(self, engine_dir: str, max_wait_ms: float, depth: int):
        from rtdm_tpu.export.engine import Engine
        from rtdm_tpu.serve.batcher import MicroBatcher
        self.engine = Engine.load(engine_dir)
        self.size = self.engine.spec.image_size
        # Warm BEFORE serving: when the engine dir carries no exec.xla (or
        # the backend can't deserialize it), the first dispatch pays the
        # 20-60s XLA compile — measured landing inside request latency as
        # a 57.4s server-side p99 outlier (artifacts/serve_loadtest/
        # native_decode_cls_c64.json, round 4). A compile belongs in
        # startup, never in a timed request.
        self.engine(np.zeros((1, self.size, self.size, 3), np.uint8))
        self.batcher = MicroBatcher(self.engine.dispatch,
                                    self.engine.spec.batch_size,
                                    max_wait_ms=max_wait_ms, depth=depth)

    def __call__(self, body: bytes) -> dict:
        frame = _native_classify_frame(body, self.size)
        if frame is None:
            from rtdm_tpu.cli.aider_predict import preprocess
            frame = preprocess(_decode_image(body), self.size)[0]
        probs = np.asarray(self.batcher(frame), np.float32)
        idx = int(np.argmax(probs))
        return {"label": CLASS_NAMES[idx] if idx < len(CLASS_NAMES)
                else str(idx),
                "confidence": float(probs[idx]),
                "probs": {CLASS_NAMES[i]: float(p)
                          for i, p in enumerate(probs)
                          if i < len(CLASS_NAMES)}}


class _DetectService:
    def __init__(self, engine_dir: str, max_wait_ms: float, depth: int,
                 names: Optional[list] = None):
        import jax.numpy as jnp
        from rtdm_tpu.export.detector import load_detector
        from rtdm_tpu.serve.batcher import MicroBatcher
        self.det = load_detector(engine_dir)
        self.size = self.det.spec.img_size
        self.names = names or ["person", "vehicle"]
        self.det.warmup()  # compile at startup, never in a timed request
        b = self.det.batch_size

        def dispatch(frames: np.ndarray):
            n = frames.shape[0]
            if n < b:
                frames = np.concatenate(
                    [frames, np.zeros((b - n,) + frames.shape[1:],
                                      frames.dtype)])
            return self.det._fn(jnp.asarray(frames))

        self.batcher = MicroBatcher(dispatch, b, max_wait_ms=max_wait_ms,
                                    depth=depth)

    def __call__(self, body: bytes) -> dict:
        from rtdm_tpu.data import native_io
        res = (native_io.decode_jpeg_letterbox(body, self.size)
               if native_io.available() else None)
        if res is not None:
            # one native call: decode + letterbox (same geometry as
            # letterbox_image — the eval loader already uses them
            # interchangeably, data/odder.py:550)
            boxed, gain, pads, orig_hw = res
        else:
            from rtdm_tpu.data.odder import letterbox_image
            img = _decode_image(body)
            boxed, gain, pads = letterbox_image(img, self.size)
            orig_hw = img.shape[:2]
        det, count = self.batcher(boxed)
        return detections_to_json(np.asarray(det, np.float32), int(count),
                                  gain, pads, orig_hw, self.names)


def detections_to_json(det: np.ndarray, count: int, gain: float,
                       pads: tuple, orig_hw: tuple, names: list) -> dict:
    """(max_det, 6)+count -> JSON dict with boxes un-letterboxed into
    original pixels (scale_coords semantics, using the exact gain/pad the
    letterbox applied)."""
    (oh, ow), (pad_w, pad_h) = orig_hw, pads
    out = []
    for i in range(count):
        x1, y1, x2, y2, conf, cls = det[i, :6]
        box = [(x1 - pad_w) / gain, (y1 - pad_h) / gain,
               (x2 - pad_w) / gain, (y2 - pad_h) / gain]
        box = [float(np.clip(v, 0, [ow, oh, ow, oh][j]))
               for j, v in enumerate(box)]
        c = int(cls)
        out.append({"box": box, "conf": float(conf), "cls": c,
                    "name": names[c] if c < len(names) else str(c)})
    return {"count": count, "detections": out}


def make_server(port: int, classify: Optional[_ClassifyService],
                detect: Optional[_DetectService]) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True,
                                 "classify": classify is not None,
                                 "detect": detect is not None})
            elif self.path == "/stats":
                stats = {}
                if classify:
                    stats["classify"] = classify.batcher.stats().as_dict()
                if detect:
                    stats["detect"] = detect.batcher.stats().as_dict()
                self._json(200, stats)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            svc = {"/v1/classify": classify, "/v1/detect": detect}.get(
                self.path)
            if svc is None:
                self._json(404, {"error": f"no service at {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                result = svc(self.rfile.read(n))
                self._json(200, result)
            except TimeoutError as e:
                # batcher future timed out — the server is warming up
                # (first dispatch pays the XLA compile) or overloaded;
                # retryable, so 503 not 400
                self._json(503, {"error": f"{type(e).__name__}: {e}",
                                 "retryable": True})
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    class Server(ThreadingHTTPServer):
        # stdlib default listen backlog is 5: at ~50 concurrent clients
        # the TPU-backed load test measured 1-5% of connections RESET
        # while requests queued behind a dispatch (artifacts/
        # serve_loadtest). The batcher already bounds admitted work, so
        # a deep accept queue is safe.
        request_queue_size = 128
        daemon_threads = True

    return Server(("0.0.0.0", port), Handler)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--engine", help="classifier engine dir (Engine.save)")
    ap.add_argument("--detector", help="detector engine dir (save_detector)")
    ap.add_argument("--names", help="comma-separated detector class names")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-wait-ms", type=float, default=2.0,
                    help="micro-batch deadline after the first request")
    ap.add_argument("--depth", type=int, default=2,
                    help="in-flight batches (double buffering)")
    args = ap.parse_args(argv)
    if not args.engine and not args.detector:
        ap.error("need --engine and/or --detector")
    classify = (_ClassifyService(args.engine, args.max_wait_ms, args.depth)
                if args.engine else None)
    names = args.names.split(",") if args.names else None
    detect = (_DetectService(args.detector, args.max_wait_ms, args.depth,
                             names) if args.detector else None)
    server = make_server(args.port, classify, detect)
    print(f"rtdm-serve listening on :{server.server_address[1]} "
          f"(classify={bool(classify)}, detect={bool(detect)})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        if classify:
            classify.batcher.close()
        if detect:
            detect.batcher.close()


if __name__ == "__main__":
    main()
