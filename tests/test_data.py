"""AIDER data pipeline tests: transform parity vs torchvision, batch
shapes, padding, corrupt-image fallback."""

import csv
import os

import numpy as np
import pytest
from PIL import Image

from rtdm_tpu.data.aider import AiderDataset, BatchLoader, normalize_batch


@pytest.fixture(scope="module")
def synthetic_aider(tmp_path_factory):
    """A tiny on-disk AIDER-style dataset: 12 images, 5 classes."""
    root = tmp_path_factory.mktemp("aider")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        label = i % 5
        sub = root / f"class_{label}"
        sub.mkdir(exist_ok=True)
        h, w = rng.integers(160, 320, 2)
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        rel = f"class_{label}/img_{i}.jpg"
        Image.fromarray(arr).save(root / rel)
        rows.append((rel, label))
    csv_path = root / "split.csv"
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(csv_path), str(root)


def test_eval_transform_matches_torchvision_semantics(synthetic_aider):
    """Independent PIL implementation of torchvision Resize(short)+CenterCrop
    (what the reference's val transform does, aider.py:413-419)."""
    csv_path, root = synthetic_aider
    size = 140
    target = int(size * 1.14)  # 159
    ds = AiderDataset(csv_path, root, size)
    for idx in range(4):
        got, _ = ds.load(idx)
        path, _ = ds.samples[idx]
        img = Image.open(path).convert("RGB")
        w, h = img.size
        if w <= h:  # torchvision Resize(int): short side -> target
            nw, nh = target, int(round(h * target / w))
        else:
            nw, nh = int(round(w * target / h)), target
        img = img.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - size) // 2, (nh - size) // 2
        want = np.asarray(img.crop((left, top, left + size, top + size)),
                          np.uint8)
        assert got.shape == want.shape == (size, size, 3)
        # identical resize kernel (PIL bilinear) -> byte-identical output
        np.testing.assert_array_equal(got, want)


def test_batch_loader_shapes_and_padding(synthetic_aider):
    csv_path, root = synthetic_aider
    ds = AiderDataset(csv_path, root, 140)
    loader = BatchLoader(ds, batch_size=8, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    (img0, lbl0, v0), (img1, lbl1, v1) = batches
    assert img0.shape == img1.shape == (8, 140, 140, 3)
    assert img0.dtype == np.uint8
    assert (v0, v1) == (8, 4)
    assert np.all(img1[4:] == 0)  # padded rows are zeros


def test_drop_last_and_shuffle(synthetic_aider):
    csv_path, root = synthetic_aider
    ds = AiderDataset(csv_path, root, 140)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                         seed=1)
    assert len(loader) == 1
    epoch1 = [lbl for _, lbl, _ in loader][0]
    epoch2 = [lbl for _, lbl, _ in loader][0]
    assert not np.array_equal(epoch1, epoch2)  # reshuffled across epochs


def test_train_transform_shape_and_determinism(synthetic_aider):
    csv_path, root = synthetic_aider
    ds = AiderDataset(csv_path, root, 140, train=True)
    img, lbl = ds.load(0, np.random.default_rng(7))
    img2, _ = ds.load(0, np.random.default_rng(7))
    assert img.shape == (140, 140, 3)
    np.testing.assert_array_equal(img, img2)  # same rng -> same aug


def test_corrupt_image_fallback(synthetic_aider, tmp_path):
    csv_path, root = synthetic_aider
    bad_csv = tmp_path / "bad.csv"
    with open(bad_csv, "w", newline="") as f:
        csv.writer(f).writerows([("missing/nope.jpg", 1)])
    ds = AiderDataset(bad_csv, root, 140)
    img, lbl = ds.load(0)
    assert img.shape == (140, 140, 3) and np.all(img == 0) and lbl == 1
    assert ds.load_errors == 1


def test_class_weights(synthetic_aider):
    csv_path, root = synthetic_aider
    ds = AiderDataset(csv_path, root, 140)
    w = ds.class_weights()
    assert w.shape == (5,)
    assert np.all(w > 0)


def test_normalize_batch():
    u8 = np.full((2, 4, 4, 3), 255, np.uint8)
    out = np.asarray(normalize_batch(u8))
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_default_names_by_class_count():
    """default_names mirrors tensorrt_inference/utils/yolo_classes.py
    get_cls_dict: AIDER pair for nc=2, COCO-80 for nc=80, CLS{i} else."""
    from rtdm_tpu.data.odder import default_names

    assert default_names(2) == ["person", "vehicle"]
    coco = default_names(80)
    assert len(coco) == 80 and coco[0] == "person" and coco[-1] == "toothbrush"
    assert default_names(3) == ["CLS0", "CLS1", "CLS2"]


def test_detection_dataset_rejects_out_of_range_class(tmp_path):
    """Class ids >= nc abort at LOAD time with the offending file named
    (yolov3/utils/utils.py:480-483 moved out of the jitted loss)."""
    import pytest

    from rtdm_tpu.data.odder import DetectionDataset

    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    from PIL import Image
    Image.new("RGB", (32, 32)).save(img_dir / "a.jpg")
    (lab_dir / "a.txt").write_text("7 0.5 0.5 0.2 0.2\n")
    lst = tmp_path / "list.txt"
    lst.write_text(str(img_dir / "a.jpg") + "\n")

    # without nc: loads fine (legacy behavior)
    ds = DetectionDataset(str(lst), 64, base_dir=str(tmp_path))
    assert len(ds.labels[0]) == 1
    with pytest.raises(ValueError, match=r"class ids.*\[0, 2\)"):
        DetectionDataset(str(lst), 64, base_dir=str(tmp_path),
                         num_classes=2)


def test_single_cls_collapses_labels(tmp_path):
    """single_cls maps every class id to 0 at load (yolov5/utils/
    datasets.py:410) and dedups rows that then coincide."""
    from rtdm_tpu.data.odder import DetectionDataset

    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    from PIL import Image
    Image.new("RGB", (32, 32)).save(img_dir / "a.jpg")
    (lab_dir / "a.txt").write_text(
        "1 0.5 0.5 0.2 0.2\n0 0.5 0.5 0.2 0.2\n0 0.3 0.3 0.1 0.1\n")
    lst = tmp_path / "list.txt"
    lst.write_text(str(img_dir / "a.jpg") + "\n")

    ds = DetectionDataset(str(lst), 64, base_dir=str(tmp_path),
                          num_classes=2, single_cls=True)
    lab = ds.labels[0]
    assert (lab[:, 0] == 0).all()
    assert len(lab) == 2  # classes 0/1 on the same box collapsed


def test_cache_images_same_samples(monkeypatch):
    """--cache-images must not change what the loader yields: train-path
    samples (mosaic) are identical with and without the RAM cache, and the
    cache actually holds the decoded array after first touch. The native
    decode-at-scale path is pinned OFF here: cache-off jpgs legitimately
    take it (DCT-prescale decodes at a different resolution than the
    cached full-res raw, same trade _load_eval documents), so bit-equality
    is only a cache-logic invariant within ONE decode path."""
    import pytest

    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    import rtdm_tpu.data.native_io as native_io
    from rtdm_tpu.data.odder import DetectionDataset

    monkeypatch.setattr(native_io, "decode_jpeg_letterbox",
                        lambda *a, **k: None)

    lst = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/data/custom/test-min.txt")
    base = str(REFERENCE_ROOT / "code/victim_localization/yolov3")
    cold = DetectionDataset(lst, 192, base_dir=base, train=True)
    hot = DetectionDataset(lst, 192, base_dir=base, train=True,
                           cache_images=True)
    a = cold.load(2, np.random.default_rng(7))
    b = hot.load(2, np.random.default_rng(7))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
    # second touch serves the SAME cached array
    r1 = hot.load_raw(2)
    r2 = hot.load_raw(2)
    assert r1 is r2
    assert cold.load_raw(2) is not cold.load_raw(2)


def test_detection_dataset_shallow_list_path(tmp_path, monkeypatch):
    """A list file fewer than 3 path components deep must fall back to
    cwd as base_dir, not raise IndexError."""
    from PIL import Image

    from rtdm_tpu.data.odder import DetectionDataset

    img = tmp_path / "im.jpg"
    Image.new("RGB", (16, 16)).save(img)
    lst = tmp_path / "train.txt"
    lst.write_text(str(img) + "\n")  # absolute path inside
    monkeypatch.chdir(tmp_path)
    ds = DetectionDataset("train.txt", 32)  # single-component list path
    assert len(ds) == 1


def test_collect_image_paths_recursive_dir(tmp_path):
    """Directory sources are walked recursively (v5 datasets.py:368-384
    `glob('**/*.*')`): images in per-scene subdirs are found."""
    from PIL import Image

    from rtdm_tpu.data.odder import collect_image_paths

    (tmp_path / "sceneA").mkdir()
    (tmp_path / "sceneB" / "sub").mkdir(parents=True)
    Image.new("RGB", (8, 8)).save(tmp_path / "top.jpg")
    Image.new("RGB", (8, 8)).save(tmp_path / "sceneA" / "a.jpg")
    Image.new("RGB", (8, 8)).save(tmp_path / "sceneB" / "sub" / "b.png")
    (tmp_path / "sceneA" / "notes.txt").write_text("skip")
    got = collect_image_paths(str(tmp_path), tmp_path)
    assert [p.split(str(tmp_path) + "/")[1] for p in got] == [
        "sceneA/a.jpg", "sceneB/sub/b.png", "top.jpg"]


def test_frame_source_error_raises_not_silent_eos(tmp_path):
    """A producer failure (unopenable video) raises from read() instead
    of masquerading as a clean end-of-stream."""
    import pytest as _pytest

    from rtdm_tpu.data.camera import FrameSource

    bad = tmp_path / "missing.mp4"  # never created
    src = FrameSource.open(str(bad)).start()
    with _pytest.raises(RuntimeError, match="failed"):
        src.read(timeout=30.0)
    src.stop()


def test_load_scaled_native_matches_pil_fallback():
    """load_scaled's native crop (letterboxed square minus pads) must give
    the aspect-preserved long-side=s resize: same shape (+-1px rounding)
    and pixel-close content vs the PIL fallback path."""
    import pytest

    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    import rtdm_tpu.data.native_io as native_io
    from rtdm_tpu.data.odder import DetectionDataset

    if not native_io.available():
        pytest.skip("native IO unavailable")
    lst = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/data/custom/test-min.txt")
    base = str(REFERENCE_ROOT / "code/victim_localization/yolov3")
    ds = DetectionDataset(lst, 192, base_dir=base)
    for idx in range(3):
        nat = ds.load_scaled(idx, 192)
        raw = ds.load_raw(idx)
        h0, w0 = raw.shape[:2]
        g = 192 / max(h0, w0)
        assert max(nat.shape[0], nat.shape[1]) == 192
        assert abs(nat.shape[0] - h0 * g) <= 1
        assert abs(nat.shape[1] - w0 * g) <= 1
        # content agreement: native DCT-prescale+fixed-point vs PIL
        # antialias differ per-pixel on detail-rich photos, but a
        # mis-cropped region (pads included / content offset) would
        # destroy the pixelwise correlation
        from PIL import Image
        pil = np.asarray(Image.fromarray(raw).resize(
            (nat.shape[1], nat.shape[0]), Image.BILINEAR), np.uint8)
        a = nat.astype(np.float32).ravel()
        b = pil.astype(np.float32).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.95, corr
        assert np.abs(a - b).mean() < 20.0


def test_scaled_tile_cache_matches_uncached(tmp_path):
    """--cache-images memoizes the post-resize mosaic tile (the reference
    caches load_image's resized array, datasets.py:393-404); the cached
    result must be pixel-identical to the uncached PIL fallback path for
    the same raw frame, and repeated loads must hit the memo."""
    import numpy as np
    from PIL import Image

    from rtdm_tpu.data.odder import DetectionDataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (90, 120, 3), dtype=np.uint8)
                        ).save(img_dir / f"{i}.png")  # png: no native path
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(str(img_dir / f"{i}.png") for i in range(3)))

    cached = DetectionDataset(str(lst), img_size=64, base_dir=str(tmp_path),
                              cache_images=True)
    uncached = DetectionDataset(str(lst), img_size=64,
                                base_dir=str(tmp_path), cache_images=False)
    for i in range(3):
        a = cached.load_scaled(i, 64)
        b = uncached.load_scaled(i, 64)
        np.testing.assert_array_equal(a, b)
        assert cached.load_scaled(i, 64) is a  # memo hit, not recompute
