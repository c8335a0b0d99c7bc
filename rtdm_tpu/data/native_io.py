"""ctypes bridge to the native IO runtime (native/librtdm_io.so).

Auto-builds the shared library on first use when g++ is available;
everything degrades gracefully to the PIL path when it is not. The native
decoder uses libjpeg DCT prescaling (decode at ~target size), which the
PIL path cannot do per-call, so dataset/streaming preprocessing drops from
tens of ms to a few ms per aerial frame on one core.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librtdm_io.so")

_lib = None
_tried = False
_load_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "clean", "all"],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.info("native IO unavailable (build failed: %s); "
                    "using PIL path", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    # serialized: the loader thread pool hits the first decode together —
    # without the lock, two threads can race into two concurrent
    # `make clean all` builds (the second clean deletes the first's .so)
    # and late arrivals during the compile silently fall back to PIL
    with _load_lock:
        if _lib is not None or _tried:
            return _lib
        return _load_locked()


def _load_locked():
    global _lib, _tried
    _tried = True
    # rebuild when absent OR stale (source newer than the .so): a
    # pre-built .so from an older checkout may lack newer symbols, and
    # dlopen caching makes rebuild-after-load unreliable — decide BEFORE
    # the first CDLL
    src = os.path.join(_NATIVE_DIR, "rtdm_io.cpp")
    stale = (not os.path.exists(_SO_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)))
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.rtdm_decode_batch  # symbol check before binding argtypes
        lib.rtdm_decode_jpeg_letterbox_rect  # newest symbol (stale .so?)
    except (OSError, AttributeError) as e:
        logger.info("native IO unavailable or stale (%s); using PIL path",
                    e)
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.rtdm_decode_jpeg_letterbox.argtypes = [
        u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
        u8p, f32p, f32p, f32p, i32p, i32p]
    lib.rtdm_decode_jpeg_letterbox.restype = ctypes.c_int
    lib.rtdm_decode_jpeg_letterbox_rect.argtypes = [
        u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_uint8, u8p, f32p, f32p, f32p, i32p, i32p]
    lib.rtdm_decode_jpeg_letterbox_rect.restype = ctypes.c_int
    lib.rtdm_letterbox_rgb.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
        u8p, f32p, f32p, f32p]
    lib.rtdm_letterbox_rgb.restype = ctypes.c_int
    lib.rtdm_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint8, u8p, f32p, f32p, i32p, i32p,
        ctypes.c_int]
    lib.rtdm_decode_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg_letterbox(data: bytes, size: int, pad_value: int = 114
                          ) -> Optional[Tuple[np.ndarray, float,
                                              Tuple[float, float],
                                              Tuple[int, int]]]:
    """JPEG bytes -> (letterboxed (size,size,3) u8, gain, (pad_w, pad_h),
    (orig_h, orig_w)); None when native IO or the decode is unavailable.

    The square decode IS the uncapped rect decode with th == tw (the C
    side routes the square ABI the same way, rtdm_io.cpp:210-217) — one
    marshaling path, no drift."""
    return decode_jpeg_letterbox_rect(data, size, size, pad_value,
                                      gain_cap=0.0)


def decode_jpeg_letterbox_rect(data: bytes, out_h: int, out_w: int,
                               pad_value: int = 114,
                               gain_cap: float = 0.0
                               ) -> Optional[Tuple[np.ndarray, float,
                                                   Tuple[float, float],
                                                   Tuple[int, int]]]:
    """JPEG bytes -> (letterboxed (out_h,out_w,3) u8, gain, (pad_w, pad_h),
    (orig_h, orig_w)) for a RECT target (the rect-batch bucket shapes,
    datasets.py:285-316). `gain_cap` > 0 bounds the resize factor so
    oversized buckets become border, not resolution (the reference's
    scaleup=False geometry); None when native IO or the decode is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    gain = ctypes.c_float()
    pw = ctypes.c_float()
    ph = ctypes.c_float()
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    buf = np.frombuffer(data, np.uint8)
    rc = lib.rtdm_decode_jpeg_letterbox_rect(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out_h, out_w, 1, float(gain_cap), pad_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(gain), ctypes.byref(pw), ctypes.byref(ph),
        ctypes.byref(oh), ctypes.byref(ow))
    if rc != 0:
        return None
    return out, float(gain.value), (float(pw.value), float(ph.value)), \
        (int(oh.value), int(ow.value))


def decode_batch(paths, size: int, letterbox: bool = True,
                 pad_value: int = 114, nthreads: int = 0):
    """Decode+letterbox a batch of JPEG files into ONE (N,size,size,3) u8
    buffer via the native thread pool — the whole loader hot path (file
    read, decode, resize, pad) is a single ctypes call. Returns
    (batch, gains (N,), pads (N,2), orig_hw (N,2), ok (N,) bool) or None
    when native IO is unavailable. Failed slots are pad-filled with
    ok=False; callers keep their PIL fallback per failed image."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    gains = np.empty((n,), np.float32)
    pads = np.empty((n, 2), np.float32)
    orig = np.empty((n, 2), np.int32)
    rcs = np.empty((n,), np.int32)
    if n == 0:
        return out, gains, pads, orig, np.zeros((0,), bool)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.rtdm_decode_batch(
        arr, n, size, int(letterbox), pad_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nthreads)
    return out, gains, pads, orig, rcs == 0


def letterbox_rgb(frame: np.ndarray, size: int, pad_value: int = 114
                  ) -> Optional[Tuple[np.ndarray, float,
                                      Tuple[float, float]]]:
    """Decoded RGB frame -> letterboxed square (camera path)."""
    lib = _load()
    if lib is None:
        return None
    frame = np.ascontiguousarray(frame, np.uint8)
    h, w = frame.shape[:2]
    out = np.empty((size, size, 3), np.uint8)
    gain = ctypes.c_float()
    pw = ctypes.c_float()
    ph = ctypes.c_float()
    lib.rtdm_letterbox_rgb(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, size,
        pad_value, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(gain), ctypes.byref(pw), ctypes.byref(ph))
    return out, float(gain.value), (float(pw.value), float(ph.value))
