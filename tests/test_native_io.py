"""Native IO runtime (librtdm_io.so): geometry parity with the PIL path."""

import io

import numpy as np
import pytest
from PIL import Image

from rtdm_tpu.data import native_io
from rtdm_tpu.data.odder import letterbox_image

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native IO lib not built")


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=92)
    return buf.getvalue()


@pytest.mark.parametrize("h,w", [(372, 350), (1200, 1600), (416, 416)])
def test_decode_letterbox_geometry_matches_pil(rng, h, w):
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr)
    res = native_io.decode_jpeg_letterbox(data, 416)
    assert res is not None
    out, gain, (pw, ph), (oh, ow) = res
    assert (oh, ow) == (h, w)
    img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    want, g2, (pw2, ph2) = letterbox_image(img, 416)
    assert out.shape == want.shape == (416, 416, 3)
    np.testing.assert_allclose(gain, g2, rtol=1e-5)
    assert (pw, ph) == (pw2, ph2)
    # padding regions identical; content tolerance is loose here because
    # PIL antialiases downscales while native matches cv2.INTER_LINEAR
    # (the reference's kernel) — see the cv2 test below for the tight one
    pad_mask = np.ones((416, 416), bool)
    y0, x0 = int(ph), int(pw)
    nh = 416 - 2 * y0
    nw = 416 - 2 * x0
    pad_mask[y0:y0 + nh, x0:x0 + nw] = False
    np.testing.assert_array_equal(out[pad_mask], want[pad_mask])


def test_letterbox_rgb_matches_cv2(rng):
    """Tight parity vs cv2.INTER_LINEAR — the reference's resize kernel
    (yolov3/utils/datasets.py:599-630 letterbox uses cv2.resize)."""
    import cv2

    arr = rng.integers(0, 255, (300, 500, 3), dtype=np.uint8)
    res = native_io.letterbox_rgb(arr, 256)
    assert res is not None
    out, gain, (pw, ph) = res
    _, g2, (pw2, ph2) = letterbox_image(arr, 256)
    np.testing.assert_allclose(gain, g2, rtol=1e-5)
    assert (pw, ph) == (pw2, ph2)
    nw, nh = int(round(500 * gain)), int(round(300 * gain))
    want = cv2.resize(arr, (nw, nh), interpolation=cv2.INTER_LINEAR)
    content = out[int(ph):int(ph) + nh, int(pw):int(pw) + nw]
    diff = np.abs(content.astype(int) - want.astype(int))
    assert diff.mean() < 1.5 and diff.max() <= 3  # fixed-point rounding


def test_corrupt_jpeg_returns_none():
    assert native_io.decode_jpeg_letterbox(b"not a jpeg", 64) is None
