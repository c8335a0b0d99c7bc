"""Unified frame sources with a threaded grab loop.

Re-implements the reference's capture layer semantics
(tensorrt_inference/utils/camera.py:140+ — IP/RTSP/USB/onboard/video/image
unified behind one class with a background grab thread;
real-time-inference.py:167-171 — imutils WebcamVideoStream/FileVideoStream):

- `FrameSource.open(uri)` accepts: an image file, a directory of images, a
  video file, an integer/'/dev/videoN' webcam id, or an rtsp:// URL.
- A daemon thread grabs frames into a 1-slot latest-frame mailbox (live
  sources drop stale frames, exactly like the threaded grab in the
  reference) or a bounded queue (file sources, lossless).
- Frames come out as RGB uint8 HWC.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")
VID_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".m4v")


class FrameSource:
    def __init__(self, uri, live: bool, queue_size: int = 64):
        self.uri = uri
        self.live = live
        self._queue: "queue.Queue" = queue.Queue(maxsize=1 if live
                                                 else queue_size)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.frames_read = 0

    # -- construction ---------------------------------------------------
    @staticmethod
    def open(uri) -> "FrameSource":
        if isinstance(uri, int) or (isinstance(uri, str)
                                    and uri.startswith("/dev/video")):
            return _CvSource(uri, live=True)
        if isinstance(uri, str) and uri.startswith(("rtsp://", "http://",
                                                    "https://")):
            return _CvSource(uri, live=True)
        if os.path.isdir(uri):
            return _ImageDirSource(uri)
        if isinstance(uri, str) and uri.lower().endswith(IMG_EXTS):
            return _ImageDirSource(uri, single=True)
        if isinstance(uri, str) and uri.lower().endswith(VID_EXTS):
            return _CvSource(uri, live=False)
        raise ValueError(f"unrecognized source: {uri!r}")

    # -- threaded producer ----------------------------------------------
    def start(self) -> "FrameSource":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        for frame in self._produce():
            if self._stop.is_set():
                break
            if self.live:
                # latest-frame mailbox: drop stale
                try:
                    self._queue.get_nowait()
                except queue.Empty:
                    pass
            self._queue.put(frame)
        self._queue.put(None)  # sentinel

    def _produce(self) -> Iterator[np.ndarray]:
        raise NotImplementedError

    # -- consumer --------------------------------------------------------
    def read(self, timeout: float = 10.0) -> Optional[np.ndarray]:
        try:
            frame = self._queue.get(timeout=timeout)
        except queue.Empty:
            return None
        if frame is not None:
            self.frames_read += 1
        return frame

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    def stop(self) -> None:
        self._stop.set()


class _ImageDirSource(FrameSource):
    def __init__(self, path: str, single: bool = False):
        super().__init__(path, live=False)
        if single:
            self.paths = [path]
        else:
            self.paths = sorted(
                p for p in glob.glob(os.path.join(path, "*"))
                if p.lower().endswith(IMG_EXTS))
        if not self.paths:
            raise FileNotFoundError(f"no images under {path}")

    def _produce(self):
        from PIL import Image
        for p in self.paths:
            with open(p, "rb") as f:
                yield np.asarray(Image.open(f).convert("RGB"), np.uint8)


class _CvSource(FrameSource):
    def __init__(self, uri, live: bool):
        super().__init__(uri, live=live)

    def _produce(self):
        import cv2
        cap = cv2.VideoCapture(self.uri)
        if not cap.isOpened():
            raise RuntimeError(f"cannot open capture source {self.uri!r}")
        try:
            while True:
                ok, frame_bgr = cap.read()
                if not ok:
                    return
                yield frame_bgr[:, :, ::-1].copy()  # BGR -> RGB
        finally:
            cap.release()
