"""Synthetic soak-dataset generator (rtdm_tpu/data/synth.py): layouts
must be exactly what DetectionDataset / AiderDataset consume, labels
exact and in range."""

import numpy as np
import pytest


def test_detection_layout_loads(tmp_path):
    from rtdm_tpu.data.odder import DetectionDataset, load_data_spec
    from rtdm_tpu.data.synth import generate_detection_dataset

    data_path, yaml_path = generate_detection_dataset(
        tmp_path, n_train=6, n_val=3, seed=1,
        sizes=((320, 240), (240, 320)))
    for cfg_path in (data_path, yaml_path):
        spec = load_data_spec(cfg_path)
        assert spec["classes"] == 2
        ds = DetectionDataset(spec["valid"], 320, base_dir=spec["base"],
                              num_classes=2)
        assert len(ds) == 3
        sample = ds.load(0)
        n = int(sample["num_labels"])
        assert n >= 1
        lab = sample["labels"][:n]
        assert np.all(lab[:, 0] < 2)
        # eval labels are pixel-space cxcywh on the letterboxed canvas
        assert np.all(lab[:, 3:] > 0)
        assert np.all(lab[:, 1:] <= max(sample["image"].shape))


def test_detection_labels_match_pixels(tmp_path):
    """The written bbox must actually cover the drawn object: crop each
    label region and verify it differs from the background statistics."""
    from PIL import Image

    from rtdm_tpu.data.synth import make_detection_image

    rng = np.random.default_rng(3)
    img, labels = make_detection_image(rng, 320, 240, max_objects=3)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    h, w = img.shape[:2]
    for cls, cx, cy, bw, bh in labels:
        x0 = int((cx - bw / 2) * w)
        x1 = int((cx + bw / 2) * w)
        y0 = int((cy - bh / 2) * h)
        y1 = int((cy + bh / 2) * h)
        assert 0 <= x0 < x1 <= w and 0 <= y0 < y1 <= h
        crop = img[y0:y1, x0:x1].astype(np.float32)
        # an object fills a large fraction of its own bbox: the crop's
        # color variance structure must differ from pure background
        assert crop.size > 0
        center = img[(y0 + y1) // 2, (x0 + x1) // 2].astype(np.float32)
        border = np.concatenate([img[0].reshape(-1, 3),
                                 img[-1].reshape(-1, 3)]).astype(np.float32)
        assert np.abs(center - border.mean(0)).max() > 15


def test_detection_train_batch_and_mosaic(tmp_path):
    """Generated set must survive the real training loader path (mosaic
    augmentation + fixed-shape packing)."""
    from rtdm_tpu.data.odder import DetectionDataset, load_data_spec
    from rtdm_tpu.data.synth import generate_detection_dataset

    data_path, _ = generate_detection_dataset(
        tmp_path, n_train=8, n_val=2, seed=2, sizes=((320, 240),))
    spec = load_data_spec(data_path)
    ds = DetectionDataset(spec["train"], 256, base_dir=spec["base"],
                          train=True, num_classes=2,
                          aug_hyp={"mosaic": 1.0})
    sample = ds.load(0)
    assert sample["image"].shape == (256, 256, 3)
    assert sample["image"].dtype == np.uint8


def test_classification_layout_loads(tmp_path):
    from rtdm_tpu.data.aider import CLASS_NAMES, AiderDataset
    from rtdm_tpu.data.synth import generate_classification_dataset

    root = generate_classification_dataset(
        tmp_path, n_train_per_class=3, n_val_per_class=2,
        n_test_per_class=1, seed=1)
    ds = AiderDataset(tmp_path / "synth_train.csv", root, image_size=140)
    assert len(ds) == 3 * len(CLASS_NAMES)
    img, label = ds.load(0)
    assert img.shape == (140, 140, 3) and img.dtype == np.uint8
    assert 0 <= label < len(CLASS_NAMES)
    val = AiderDataset(tmp_path / "synth_val.csv", root, image_size=140)
    assert len(val) == 2 * len(CLASS_NAMES)


def test_classification_classes_distinguishable():
    """Per-class mean colors must separate — a sanity floor under
    'learnable': if these collide the soak can't converge."""
    from rtdm_tpu.data.synth import make_classification_image

    rng = np.random.default_rng(0)
    means = []
    for label in range(5):
        imgs = [make_classification_image(rng, label, 160, 160)
                for _ in range(4)]
        means.append(np.stack(imgs).astype(np.float32).mean((0, 1, 2)))
    means = np.stack(means)
    d = np.linalg.norm(means[:, None] - means[None, :], axis=-1)
    off = d[~np.eye(5, dtype=bool)]
    assert off.min() > 20, f"class color means too close: {d}"
