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


def test_decode_batch_matches_per_image():
    """The pooled batch decoder must produce byte-identical frames and
    metadata to N per-image decode_jpeg_letterbox calls."""
    import glob

    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available() or not native_io.available():
        import pytest
        pytest.skip("reference or native IO unavailable")
    paths = sorted(glob.glob(str(
        REFERENCE_ROOT / "code/victim_localization/yolov3/data/custom/"
        "test/images/*.jpg")))
    assert len(paths) == 10
    res = native_io.decode_batch(paths, 416)
    assert res is not None
    batch, gains, pads, orig, ok = res
    assert ok.all() and batch.shape == (10, 416, 416, 3)
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            single = native_io.decode_jpeg_letterbox(f.read(), 416)
        img, g, (pw, ph), (oh, ow) = single
        np.testing.assert_array_equal(batch[i], img)
        np.testing.assert_allclose(gains[i], g, rtol=1e-6)
        assert tuple(pads[i]) == (pw, ph)
        assert tuple(orig[i]) == (oh, ow)


def test_decode_batch_failure_slots():
    """Missing/corrupt files pad-fill their slot with ok=False; good
    slots are unaffected."""
    import glob
    import tempfile

    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available() or not native_io.available():
        import pytest
        pytest.skip("reference or native IO unavailable")
    good = sorted(glob.glob(str(
        REFERENCE_ROOT / "code/victim_localization/yolov3/data/custom/"
        "test/images/*.jpg")))[0]
    with tempfile.NamedTemporaryFile(suffix=".jpg") as bad:
        bad.write(b"not a jpeg")
        bad.flush()
        batch, gains, pads, orig, ok = native_io.decode_batch(
            [good, bad.name, "/nonexistent/x.jpg"], 128)
    assert list(ok) == [True, False, False]
    assert (batch[1] == 114).all() and (batch[2] == 114).all()
    assert (batch[0] != 114).any()


@pytest.mark.parametrize("h,w,th,tw", [(372, 350, 416, 416),
                                       (503, 710, 320, 416),
                                       (751, 1052, 320, 416),
                                       (670, 670, 416, 320)])
def test_decode_letterbox_rect_geometry(rng, h, w, th, tw):
    """Rect-target native decode: geometry matches letterbox_image on the
    same (th, tw) bucket, and a square rect call is byte-identical to the
    square entry point."""
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr)
    res = native_io.decode_jpeg_letterbox_rect(data, th, tw)
    assert res is not None
    out, gain, (pw, ph), (oh, ow) = res
    assert (oh, ow) == (h, w)
    assert out.shape == (th, tw, 3)
    img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    want, g2, (pw2, ph2) = letterbox_image(img, (th, tw))
    np.testing.assert_allclose(gain, g2, rtol=1e-5)
    assert (pw, ph) == (pw2, ph2)
    # the padding border is exactly PAD_COLOR
    if ph > 0:
        assert (out[: int(ph)] == 114).all()
        assert (out[th - int(ph):] == 114).all()
    if pw > 0:
        assert (out[:, : int(pw)] == 114).all()
        assert (out[:, tw - int(pw):] == 114).all()
    # square-target rect call == the original square ABI, byte for byte
    sq_rect = native_io.decode_jpeg_letterbox_rect(data, 256, 256)
    sq = native_io.decode_jpeg_letterbox(data, 256)
    np.testing.assert_array_equal(sq_rect[0], sq[0])
    assert sq_rect[1:] == sq[1:]


def test_decode_letterbox_rect_gain_cap(rng):
    """A pad-inflated bucket (v5's +0.5, datasets.py:412-416) must become
    BORDER, not extra resolution: with the cap, gain stays
    img_size/max(h,w) (the reference's load_image-then-scaleup=False
    geometry) and the surplus is split as padding."""
    arr = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr)
    cap = 416 / 640  # nominal size 416, bucket 448x448
    res = native_io.decode_jpeg_letterbox_rect(data, 448, 448,
                                               gain_cap=cap)
    out, gain, (pw, ph), (oh, ow) = res
    np.testing.assert_allclose(gain, cap, rtol=1e-6)
    assert (pw, ph) == (16.0, 16.0)  # (448 - 416) // 2 per side
    assert (out[:16] == 114).all() and (out[:, :16] == 114).all()
    # PIL path agrees on the geometry
    img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    want, g2, (pw2, ph2) = letterbox_image(img, (448, 448), gain_cap=cap)
    np.testing.assert_allclose(g2, cap, rtol=1e-6)
    assert (pw2, ph2) == (16.0, 16.0)
    # cap larger than the natural fit is a no-op
    res2 = native_io.decode_jpeg_letterbox_rect(data, 448, 448,
                                                gain_cap=10.0)
    np.testing.assert_array_equal(res2[0],
                                  native_io.decode_jpeg_letterbox_rect(
                                      data, 448, 448)[0])
