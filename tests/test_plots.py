"""Unit tests for the detection observability plots
(yolov5/utils/plots.py surface: plot_images / plot_labels / plot_results /
plot_evolution analogues). Synthetic inputs, CPU-only, no jax."""

import os

import numpy as np

from rtdm_tpu.utils.plots import (plot_detection_batch,
                                  plot_detector_results,
                                  plot_evolution_results,
                                  plot_label_distribution)


def test_plot_detection_batch(tmp_path):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 64, 96, 3), dtype=np.uint8)
    labels = np.zeros((4, 10, 5), np.float32)
    labels[:, :, 0] = rng.integers(0, 3, (4, 10))
    labels[:, :, 1] = rng.uniform(20, 76, (4, 10))   # cx (pixels)
    labels[:, :, 2] = rng.uniform(15, 49, (4, 10))   # cy
    labels[:, :, 3:] = rng.uniform(4, 20, (4, 10, 2))  # w, h
    num = np.array([10, 3, 0, 7], np.int32)
    out = str(tmp_path / "train_batch0.jpg")
    assert plot_detection_batch(images, labels, num, out,
                                names=["a", "b", "c"]) == out
    assert os.path.getsize(out) > 1000


def test_plot_label_distribution(tmp_path):
    rng = np.random.default_rng(1)
    rows = np.column_stack([rng.integers(0, 4, 200).astype(np.float32),
                            rng.uniform(0, 1, (200, 4)).astype(np.float32)])
    out = str(tmp_path / "labels.png")
    assert plot_label_distribution(rows, out, names=["p", "q", "r", "s"]) \
        == out
    assert os.path.getsize(out) > 1000
    # empty label set must still render (a dataset with no boxes)
    out2 = str(tmp_path / "empty.png")
    plot_label_distribution(np.zeros((0, 5), np.float32), out2)
    assert os.path.getsize(out2) > 1000


def test_plot_detector_results(tmp_path):
    txt = tmp_path / "results.txt"
    txt.write_text(
        "epoch 1/3 box 0.1234 obj 0.5678 cls 0.0000 3.2s\n"
        "epoch 2/3 box 0.1000 obj 0.5000 cls 0.0001 3.1s "
        "| P 0.500 R 0.400 mAP@0.5 0.300\n"
        "epoch 3/3 box 0.0900 obj 0.4500 cls 0.0001 3.1s "
        "| P 0.600 R 0.500 mAP@0.5 0.450\n")
    out = str(tmp_path / "results.png")
    assert plot_detector_results(str(txt), out) == out
    assert os.path.getsize(out) > 1000


def test_plot_evolution_results(tmp_path):
    # exact numeric format written by train/evolve.py EvolveLog (7 result
    # columns then genes, print_mutation general.py:611-615)
    import numpy as np

    from rtdm_tpu.train.evolve import EvolveLog

    meta = {"lr0": (1, 1e-5, 0.1), "iou_t": (1, 0.0, 0.7),
            "momentum": (0.1, 0.6, 0.98)}
    log = EvolveLog(str(tmp_path / "evolve.txt"), meta)
    log.append({"lr0": 0.002, "iou_t": 0.2, "momentum": 0.9},
               [0.5, 0.4, 0.1, 0.08, 1, 2, 3])
    log.append({"lr0": 0.0025, "iou_t": 0.18, "momentum": 0.92},
               [0.6, 0.5, 0.2, 0.17, 1, 2, 3])
    out = str(tmp_path / "evolve.png")
    assert plot_evolution_results(log.path, out, keys=list(meta)) == out
    assert os.path.getsize(out) > 1000
