"""Rectangular TRAINING and eval scaleup=False geometry.

Reference semantics pinned here:
- eval never upscales: load_image only resizes down outside augment mode
  (yolov3/utils/datasets.py:517 `r < 1 or (self.augment and r != 1)`) and
  letterbox runs with scaleup=self.augment (:431) — images smaller than
  img_size keep native resolution and gain only border;
- train DOES upscale (same two lines, augment branch);
- the non-mosaic train sample is affine-warped, including the
  degenerate-box filter (:451-458);
- rect training: AR-sorted stride-multiple batch buckets (:285-316),
  mosaic disabled (:283 `self.mosaic = self.augment and not self.rect`),
  fixed sample order (train.py:185 `shuffle=not opt.rect`).
"""

import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import REFERENCE_ROOT, needs_reference

YOLO_DIR = REFERENCE_ROOT / "code/victim_localization/yolov3"


def _make_dataset(root, sizes, fmt="png", box=(0.5, 0.5, 0.5, 0.5)):
    """Synthetic (w, h) images, one class-0 box each; returns the list txt."""
    img_dir = root / "images"
    lab_dir = root / "labels"
    img_dir.mkdir(parents=True, exist_ok=True)
    lab_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = img_dir / f"im{i}.{fmt}"
        Image.fromarray(arr).save(p, quality=95)
        (lab_dir / f"im{i}.txt").write_text("0 %g %g %g %g\n" % box)
        paths.append(str(p))
    lst = root / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst)


def test_eval_never_upscales_small_images(tmp_path):
    """A 90x60 image evaluated at img_size=416 keeps its native pixels
    centered in border (gain 1), and labels keep native pixel scale."""
    from rtdm_tpu.data.odder import PAD_COLOR, DetectionDataset

    lst = _make_dataset(tmp_path, [(90, 60)], fmt="png")
    ds = DetectionDataset(lst, 416, base_dir=str(tmp_path), train=False)
    s = ds.load(0)
    img = s["image"]
    assert img.shape == (416, 416, 3)
    orig = np.asarray(Image.open(tmp_path / "images/im0.png"))
    ph, pw = (416 - 60) // 2, (416 - 90) // 2
    np.testing.assert_array_equal(img[ph:ph + 60, pw:pw + 90], orig)
    assert np.all(img[0] == PAD_COLOR) and np.all(img[-1] == PAD_COLOR)
    lab = s["labels"][: int(s["num_labels"])]
    np.testing.assert_allclose(lab[0, 3], 45.0)  # 0.5 * 90 * gain(=1)
    np.testing.assert_allclose(lab[0, 4], 30.0)


def test_eval_native_jpeg_small_image_gain_one(tmp_path):
    """Same no-upscale geometry through the native libjpeg decode path
    (which falls back to PIL when the lib is unavailable — both must
    give gain 1 for a small image)."""
    from rtdm_tpu.data.odder import PAD_COLOR, DetectionDataset

    lst = _make_dataset(tmp_path, [(90, 60)], fmt="jpg")
    ds = DetectionDataset(lst, 416, base_dir=str(tmp_path), train=False)
    s = ds.load(0)
    img = s["image"]
    ph, pw = (416 - 60) // 2, (416 - 90) // 2
    assert np.all(img[: ph - 1] == PAD_COLOR)
    assert np.all(img[ph + 61:] == PAD_COLOR)
    # decoded content sits at native resolution (libjpeg vs PIL IDCT may
    # differ by ±1-2 LSB on the same bytes)
    pil = np.asarray(Image.open(tmp_path / "images/im0.jpg").convert("RGB"))
    crop = img[ph:ph + 60, pw:pw + 90].astype(np.int32)
    assert np.mean(np.abs(crop - pil.astype(np.int32))) < 2.0
    lab = s["labels"][: int(s["num_labels"])]
    np.testing.assert_allclose(lab[0, 3], 45.0)


def test_train_sample_upscales_small_images(tmp_path):
    """The TRAIN path scales the long side to img_size in both directions
    (datasets.py:517 augment branch): the same 90x60 image trained at 180
    doubles its label geometry."""
    from rtdm_tpu.data.odder import DetectionDataset

    lst = _make_dataset(tmp_path, [(90, 60)], fmt="png")
    aug = {"mosaic": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0,
           "hsv_v": 0.0}
    ds = DetectionDataset(lst, 180, base_dir=str(tmp_path), train=True,
                          aug_hyp=aug)
    s = ds.load(0, np.random.default_rng(0))
    assert s["image"].shape == (180, 180, 3)
    lab = s["labels"][: int(s["num_labels"])]
    assert len(lab) == 1
    np.testing.assert_allclose(lab[0, 3], 90.0, atol=0.5)  # 45 * gain 2
    np.testing.assert_allclose(lab[0, 4], 60.0, atol=0.5)


def test_nonmosaic_train_applies_degenerate_filter(tmp_path):
    """random_affine runs on the non-mosaic train sample (datasets.py:
    451-458) — its w/h > 4px filter drops a 2px-wide box that eval keeps."""
    from rtdm_tpu.data.odder import DetectionDataset

    lst = _make_dataset(tmp_path, [(100, 80)], fmt="png",
                        box=(0.5, 0.5, 0.02, 0.4))
    ev = DetectionDataset(lst, 100, base_dir=str(tmp_path), train=False)
    assert int(ev.load(0)["num_labels"]) == 1
    aug = {"mosaic": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0,
           "hsv_v": 0.0}
    tr = DetectionDataset(lst, 100, base_dir=str(tmp_path), train=True,
                          aug_hyp=aug)
    assert int(tr.load(0, np.random.default_rng(0))["num_labels"]) == 0


@needs_reference
def test_rect_train_batches_share_bucket_shapes():
    """rect+train: mosaic off, every batch letterboxed to its planned
    stride-multiple bucket, labels inside the bucket frame."""
    from rtdm_tpu.data.odder import DetectionBatchLoader, DetectionDataset

    ds = DetectionDataset(str(YOLO_DIR / "data/custom/test-min.txt"), 320,
                          base_dir=str(YOLO_DIR), train=True, rect=True,
                          batch_size=4, rect_pad=0.0)
    loader = DetectionBatchLoader(ds, 4, shuffle=False, drop_last=False,
                                  num_workers=2, seed=0)
    n_batches = 0
    for batch, valid in loader:
        h, w = batch["image"].shape[1:3]
        assert h % 32 == 0 and w % 32 == 0 and h <= 320 and w <= 320
        # the batch shape IS the plan's bucket for its members
        for i in range(valid):
            idx = int(batch["index"][i])
            assert ds.rect_shapes[idx] == (h, w)
            nl = int(batch["num_labels"][i])
            lab = batch["labels"][i][:nl]
            if nl:
                assert np.all(lab[:, 1] >= 0) and np.all(lab[:, 1] <= w)
                assert np.all(lab[:, 2] >= 0) and np.all(lab[:, 2] <= h)
        n_batches += 1
    assert n_batches == 3  # 10 mini images / bs 4
    # at least one bucket must be genuinely rectangular on this set
    shapes = {tuple(s) for s in ds.rect_shapes}
    assert any(h != w for h, w in shapes), shapes


@needs_reference
def test_rect_train_never_writes_into_the_reference_tree():
    """The <list>.shapes cache must not be created under the (protected)
    reference dataset tree even though the filesystem allows it."""
    from rtdm_tpu.data.odder import DetectionDataset

    sp = YOLO_DIR / "data/custom/test-min.shapes"
    assert not sp.exists()
    DetectionDataset(str(YOLO_DIR / "data/custom/test-min.txt"), 320,
                     base_dir=str(YOLO_DIR), train=True, rect=True,
                     batch_size=4)
    assert not sp.exists()


@needs_reference
def test_yolo_train_rect_two_epochs(tmp_path):
    """--rect end to end: 2 epochs on the mini set, one compiled step per
    distinct bucket shape, finite losses, eval + artifacts intact."""
    from rtdm_tpu.cli.yolo_train import main

    out = str(tmp_path / "rect")
    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "2", "--batch-size", "4", "--img-size", "256",
        "--nominal-batch", "4", "--burn-in", "2", "--lr0", "0.002",
        "--num-workers", "2", "--output", out, "--eval-every", "1",
        "--rect", "--no-plots",
    ])
    hist = result["history"]
    assert len(hist) == 2
    losses = np.array([h["loss"] for h in hist])
    assert np.all(np.isfinite(losses))
    assert losses[0][1] > 0
    assert hist[-1]["map50"] is not None
    assert os.path.exists(os.path.join(out, "last.npz"))


def test_rect_rejects_multi_scale(tmp_path):
    from rtdm_tpu.cli.yolo_train import main

    with pytest.raises(SystemExit, match="multi-scale"):
        main([
            "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
            "--data", str(YOLO_DIR / "data/aider-min.data"),
            "--epochs", "1", "--batch-size", "4", "--img-size", "192",
            "--rect", "--multi-scale", "--no-plots",
            "--output", str(tmp_path / "bad"),
        ])
