"""CLI-breadth smoke tests for features only reachable through flags:
hyperparameter evolution, multi-scale + image-weights training, and
dynamic-batch StableHLO export. Each runs tiny (192px, 1-epoch gens) on
the reference's bundled 10-image mini-set."""

import os
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

YOLO_DIR = REFERENCE_ROOT / "code/victim_localization/yolov3"

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")


def _train_args(out, extra):
    return [
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--epochs", "1", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--burn-in", "2", "--lr0", "0.002",
        "--num-workers", "2", "--output", out, "--eval-every", "1",
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
    ] + extra


def test_yolo_train_evolve(tmp_path):
    """--evolve N runs N mutate-train-select generations and logs
    evolve.txt (train.py:444-491's print_mutation flow)."""
    from rtdm_tpu.cli.yolo_train import main

    out = str(tmp_path / "evo")
    best_hyp, best_fit = main(_train_args(out, ["--evolve", "2"]))
    log = Path(out) / "evolve.txt"
    assert log.exists()
    # numeric print_mutation format (general.py:611-615): 7 result
    # columns + the 18-gene v3 genome, unique rows sorted by fitness
    from rtdm_tpu.train.evolve import (N_RESULT_COLS, V3_EVOLVE_META,
                                       FITNESS_W_V3, fitness)
    rows = np.loadtxt(log, ndmin=2)
    assert rows.shape[1] == N_RESULT_COLS + len(V3_EVOLVE_META)
    assert len(rows) == 2
    assert np.all(np.diff(fitness(rows, FITNESS_W_V3)) <= 0)
    assert os.path.isdir(os.path.join(out, "gen0"))
    assert os.path.isdir(os.path.join(out, "gen1"))
    assert os.path.exists(os.path.join(out, "hyp_evolved.yaml"))
    assert np.isfinite(best_fit)
    assert set(best_hyp) >= {"lr0", "iou_t", "momentum", "giou", "hsv_s"}
    # evolution scatter + per-gen observability plots were written
    assert os.path.exists(os.path.join(out, "evolve.png"))
    assert os.path.exists(os.path.join(out, "gen0", "results.png"))
    assert os.path.exists(os.path.join(out, "gen0", "labels.png"))


def test_yolo_train_multiscale_image_weights(tmp_path):
    """--multi-scale (precompiled size set) + --image-weights (error-
    biased resampling, train.py:236-239) train together without error."""
    from rtdm_tpu.cli.yolo_train import main

    out = str(tmp_path / "ms")
    result = main(_train_args(out, ["--multi-scale", "--image-weights",
                                    "--no-plots"]))
    assert np.all(np.isfinite(np.array(result["history"][0]["loss"])))


def test_export_model_dynamic_batch_cli(tmp_path):
    """export_model --dynamic-batch emits a StableHLO artifact that
    round-trips at MULTIPLE batch sizes (generate_onnx.py:31-36's
    dynamic-axis analogue)."""
    from rtdm_tpu.cli.export_model import main
    from rtdm_tpu.export.serialize import load_exported

    w = str(REFERENCE_ROOT / "code/disaster_detection/weights/"
            "squeeze-ernet-state_dict.pt")
    out = str(tmp_path / "se.stablehlo")
    main(["--model", "squeeze-ernet", "--weights", w, "--output", out,
          "--dynamic-batch"])
    assert os.path.exists(out)
    fn = load_exported(out)
    for b in (1, 3):
        probs = np.asarray(fn(np.zeros((b, 140, 140, 3), np.uint8)))
        assert probs.shape == (b, 5)
        np.testing.assert_allclose(probs.sum(1), np.ones(b), rtol=1e-3)


def test_aider_train_variant_paths(tmp_path):
    """The focal-loss + cosine-schedule + mixup/cutmix classifier config
    (all reachable only via flags) trains to finite metrics."""
    import csv

    from PIL import Image

    from rtdm_tpu.cli.aider_train import train_model
    from rtdm_tpu.core.config import TrainingConfig

    rng = np.random.default_rng(0)
    root = tmp_path / "aider"
    root.mkdir()
    colors = [(200, 40, 40), (40, 200, 40), (40, 40, 200),
              (200, 200, 40), (40, 200, 200)]
    rows = []
    for i in range(50):
        label = i % 5
        arr = np.clip(np.array(colors[label], np.uint8)[None, None]
                      + rng.normal(0, 25, (160, 160, 3)),
                      0, 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.jpg")
        rows.append((f"img_{i}.jpg", label))
    for name, subset in [("train.csv", rows[:40]), ("val.csv", rows[40:45]),
                         ("test.csv", rows[45:])]:
        with open(root / name, "w", newline="") as f:
            csv.writer(f).writerows(subset)

    config = TrainingConfig(
        model="squeeze-ernet", batch_size=5, epochs=2, lr=3e-3,
        loss="focal", scheduler="cosine", mixup_alpha=0.2,
        cutmix_alpha=0.2, label_smoothing=0.0, grad_accum_steps=1,
        precision="fp32", augment=True, early_stopping=False,
        num_workers=2, root_dir=str(root),
        train_split=str(root / "train.csv"),
        val_split=str(root / "val.csv"),
        test_split=str(root / "test.csv"),
        checkpoint_dir=str(tmp_path / "saves"),
        log_dir=str(tmp_path / "logs"))
    state, history = train_model(config)
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) and v > 0 for v in history["train_loss"])


def test_aider_train_rejects_sub_batch_split(tmp_path):
    """A train split smaller than one (rounded) batch must fail loudly,
    not silently 'train' on zero batches."""
    import csv

    from PIL import Image

    from rtdm_tpu.cli.aider_train import train_model
    from rtdm_tpu.core.config import TrainingConfig

    root = tmp_path / "tiny"
    root.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(root / "a.jpg")
    with open(root / "s.csv", "w", newline="") as f:
        csv.writer(f).writerows([("a.jpg", 0)])
    config = TrainingConfig(
        model="squeeze-ernet", batch_size=8, epochs=1, augment=False,
        root_dir=str(root), train_split=str(root / "s.csv"),
        val_split=str(root / "s.csv"), test_split=str(root / "s.csv"),
        checkpoint_dir=str(tmp_path / "saves"),
        log_dir=str(tmp_path / "logs"))
    with pytest.raises(SystemExit, match="one batch"):
        train_model(config)


def test_summary_flags(capsys):
    """--summary prints params + XLA-cost FLOPs and exits without
    touching data (aider_train and yolo_train surfaces)."""
    from rtdm_tpu.cli.yolo_train import main as yolo_main

    yolo_main(["--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
               "--img-size", "192", "--summary"])
    out = capsys.readouterr().out
    assert "params" in out.lower() and "flops" in out.lower()


def test_yolo_test_study_task(tmp_path):
    """--task study sweeps matching-IoU thresholds over ONE detection
    pass (the reference re-runs the whole eval per threshold,
    test.py:233-255) and writes the plot."""
    from rtdm_tpu.cli.yolo_test import main

    plot = str(tmp_path / "study.png")
    pairs = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--img-size", "192", "--batch-size", "4", "--task", "study",
        "--study-plot", plot,
    ])
    assert len(pairs) == 11  # 0.40 .. 0.90 in 0.05 steps
    ious = [p[0] for p in pairs]
    maps = [p[1] for p in pairs]
    assert abs(ious[0] - 0.4) < 1e-9 and abs(ious[-1] - 0.9) < 1e-9
    assert all(np.isfinite(m) for m in maps)
    # mAP is non-increasing as the matching threshold tightens
    assert all(a >= b - 1e-9 for a, b in zip(maps, maps[1:]))
    assert os.path.exists(plot)


def test_check_img_size_rounds_up_to_stride(capsys):
    """check_img_size mirrors yolov5/utils/general.py: ceil to the max
    stride, warn only when changed, never shrink."""
    from rtdm_tpu.utils.checks import check_img_size

    assert check_img_size(416) == 416
    assert capsys.readouterr().err == ""  # exact multiples stay silent
    assert check_img_size(415) == 416
    assert "415" in capsys.readouterr().err
    assert check_img_size(417) == 448  # rounds UP, never down
    assert check_img_size(1, stride=64) == 64


def test_yolo_train_evolve_v5_mutates_hyp_yaml(tmp_path):
    """--evolve on a v5 yaml model mutates the v5 genome (box/cls/obj/
    anchor_t live in the hyp YAML, yolov5/train.py meta dict) and runs
    each generation with its own per-gen hyp file."""
    import yaml as _yaml

    from rtdm_tpu.cli.yolo_train import main
    from tests.test_yolo_train import V5_MINI_YAML

    yml = tmp_path / "mini.yaml"
    yml.write_text(V5_MINI_YAML)
    out = str(tmp_path / "evo5")
    best_hyp, best_fit = main([
        "--cfg", str(yml),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "1", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--lr0", "0.01", "--num-workers", "2",
        "--no-plots", "--output", out, "--eval-every", "1",
        "--evolve", "2", "--noautoanchor",
    ])
    assert {"box", "cls", "obj", "anchor_t", "lr0", "mosaic",
            "mixup"} <= set(best_hyp)
    assert np.isfinite(best_fit)
    from rtdm_tpu.train.evolve import N_RESULT_COLS, V5_EVOLVE_META
    rows = np.loadtxt(Path(out) / "evolve.txt", ndmin=2)
    assert rows.shape[1] == N_RESULT_COLS + len(V5_EVOLVE_META)
    for g in range(2):
        hp = os.path.join(out, f"gen{g}-hyp.yaml")
        assert os.path.exists(hp)
        h = _yaml.safe_load(open(hp).read())
        # yaml genes: loss gains AND warmup/aug knobs (lr0 etc are flags)
        assert {"box", "cls", "obj", "anchor_t", "lrf", "warmup_epochs",
                "hsv_s", "mosaic"} <= set(h)
