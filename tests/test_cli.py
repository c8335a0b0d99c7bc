"""End-to-end CLI tests: train -> weights -> predict / evaluate / engine.

The synthetic dataset makes class separable by color so 2 epochs of
training must beat chance — an actual learning smoke test, not just a
plumbing check."""

import csv
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def aider_dir(tmp_path_factory):
    """AIDER-style dir: 40 images, 5 classes, each class a distinct hue."""
    root = tmp_path_factory.mktemp("aider_cli")
    rng = np.random.default_rng(0)
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200),
              (200, 200, 30), (30, 200, 200)]
    rows = []
    for i in range(40):
        label = i % 5
        base = np.array(colors[label], np.uint8)
        arr = np.clip(base[None, None] +
                      rng.normal(0, 25, (160, 160, 3)), 0, 255).astype(np.uint8)
        rel = f"img_{i}.jpg"
        Image.fromarray(arr).save(root / rel)
        rows.append((rel, label))
    for name, subset in [("train.csv", rows[:30]), ("val.csv", rows[30:35]),
                         ("test.csv", rows[35:])]:
        with open(root / name, "w", newline="") as f:
            csv.writer(f).writerows(subset)
    return root


@pytest.fixture(scope="module")
def trained(aider_dir, tmp_path_factory):
    from rtdm_tpu.cli.aider_train import train_model
    from rtdm_tpu.core.config import TrainingConfig

    out = tmp_path_factory.mktemp("run")
    config = TrainingConfig(
        model="squeeze-ernet", batch_size=5, epochs=3, lr=3e-3,
        grad_accum_steps=1, precision="fp32", augment=False,
        early_stopping=False, num_workers=2,
        root_dir=str(aider_dir),
        train_split=str(aider_dir / "train.csv"),
        val_split=str(aider_dir / "val.csv"),
        test_split=str(aider_dir / "test.csv"),
        checkpoint_dir=str(out / "saves"), log_dir=str(out / "logs"))
    state, history = train_model(config)
    return config, state, history, out


def test_training_learns(trained):
    config, state, history, out = trained
    assert len(history["train_loss"]) == 3
    assert history["train_loss"][-1] < history["train_loss"][0]
    # color-separable classes: accuracy must beat 1/5 chance comfortably
    assert history["val_acc"][-1] >= 0.4
    assert os.path.exists(config.weights)
    assert os.path.isdir(os.path.join(config.checkpoint_dir, "last"))


def test_resume_continues(trained, aider_dir):
    from rtdm_tpu.cli.aider_train import train_model
    import dataclasses
    config = dataclasses.replace(trained[0], resume=True, epochs=4)
    # replace() reruns __post_init__ which doubles batch; undo
    config.batch_size = 5
    config.image_size = 140
    state, history = train_model(config)
    assert len(history["train_loss"]) == 4  # 3 restored + 1 new


def test_predict_cli(trained, aider_dir, capsys):
    from rtdm_tpu.cli.aider_predict import main
    config = trained[0]
    idx = main(["--image", str(aider_dir / "img_35.jpg"),
                "--model", "squeeze-ernet", "--weights", config.weights])
    out = capsys.readouterr().out
    assert "prediction:" in out and "confidence:" in out
    assert 0 <= idx <= 4


def test_predict_cli_quant(trained, aider_dir, capsys):
    """--quant without --engine builds an in-memory engine at that
    precision — the reference's --trt --quant path
    (aider-predict.py:36-41,90-96)."""
    from rtdm_tpu.cli.aider_predict import main
    config = trained[0]
    idx = main(["--image", str(aider_dir / "img_35.jpg"),
                "--model", "squeeze-ernet", "--weights", config.weights,
                "--quant", "bf16"])
    out = capsys.readouterr().out
    assert "prediction:" in out
    assert 0 <= idx <= 4


def test_predict_cli_quant_engine_mismatch(trained, aider_dir, tmp_path,
                                           capsys):
    from rtdm_tpu.cli.aider_predict import main as predict_main
    from rtdm_tpu.cli.build_engine import main as build_main
    config = trained[0]
    eng_dir = str(tmp_path / "eng_fp32")
    build_main(["--model", "squeeze-ernet", "--weights", config.weights,
                "--quant", "fp32", "--batch-size", "2",
                "--output", eng_dir])
    capsys.readouterr()
    with pytest.raises(SystemExit, match="does not match"):
        predict_main(["--image", str(aider_dir / "img_35.jpg"),
                      "--model", "squeeze-ernet", "--engine", eng_dir,
                      "--quant", "int8"])


def test_evaluate_cli(trained, aider_dir, capsys):
    from rtdm_tpu.cli.evaluate_classification import main
    config = trained[0]
    metrics = main(["--model", "squeeze-ernet", "--weights", config.weights,
                    "--root-dir", str(aider_dir),
                    "--test-split", str(aider_dir / "test.csv"),
                    "--batch-size", "5", "--precision", "fp32"])
    out = capsys.readouterr().out
    assert "accuracy" in out and "frames/s" in out
    assert metrics.total == 5


def test_build_engine_cli_and_predict_with_engine(trained, aider_dir,
                                                  tmp_path, capsys):
    from rtdm_tpu.cli.build_engine import main as build_main
    from rtdm_tpu.cli.aider_predict import main as predict_main
    config = trained[0]
    eng_dir = str(tmp_path / "engine")
    build_main(["--model", "squeeze-ernet", "--weights", config.weights,
                "--quant", "fp32", "--batch-size", "4",
                "--output", eng_dir])
    assert os.path.exists(os.path.join(eng_dir, "spec.json"))
    capsys.readouterr()
    idx = predict_main(["--image", str(aider_dir / "img_36.jpg"),
                        "--model", "squeeze-ernet", "--engine", eng_dir])
    out = capsys.readouterr().out
    assert "prediction:" in out


def test_int8_engine_cli(trained, aider_dir, tmp_path):
    from rtdm_tpu.cli.build_engine import main as build_main
    from rtdm_tpu.export.engine import Engine
    config = trained[0]
    eng_dir = str(tmp_path / "engine8")
    build_main(["--model", "squeeze-ernet", "--weights", config.weights,
                "--quant", "int8", "--batch-size", "4",
                "--calib-dir", str(aider_dir), "--output", eng_dir])
    eng = Engine.load(eng_dir)
    assert eng.act_scales is not None
    out = eng(np.zeros((2, 140, 140, 3), np.uint8))
    assert out.shape == (2, 5)


def test_model_summary(capsys):
    from rtdm_tpu.utils.summary import summarize_classifier

    out = summarize_classifier("squeeze-ernet")
    assert "169,241" in out  # exact reference param count
    assert "mult-adds" in out


def test_increment_path(tmp_path):
    """Fresh runs never clobber an existing non-empty run dir
    (increment_path, yolov5/utils/general.py); resume reuses it."""
    from rtdm_tpu.utils.paths import increment_path

    d = str(tmp_path / "exp")
    assert increment_path(d) == d            # free
    os.makedirs(d)
    # MERE existence bumps (even empty: a concurrent run may have just
    # created it), exactly like the reference's increment_path
    assert increment_path(d) == d + "2"
    assert increment_path(d, exist_ok=True) == d  # resume keeps it
    assert increment_path(d + os.sep) == d + "2"  # trailing slash safe
    os.makedirs(d + "2")
    assert increment_path(d) == d + "3"
    open(str(tmp_path / "filecol"), "w").close()
    assert increment_path(str(tmp_path / "filecol")) == \
        str(tmp_path / "filecol") + "2"  # file collision bumps, no crash


def test_aider_parse_args_reference_surface(tmp_path):
    """The remaining args.py:6-183 flags map onto TrainingConfig:
    --no-amp == fp32, --warmup-epochs overrides the ratio, --image-size
    post-overrides the model-inferred size, --no-albumentations flips the
    aug style, --dropout/--min-lr/--momentum/--checkpoint-freq/
    --save-best-only/--weights land in the config."""
    from rtdm_tpu.cli.aider_train import parse_args

    cfg = parse_args([
        "--model", "squeeze-ernet", "--epochs", "10", "--no-amp",
        "--warmup-epochs", "2", "--image-size", "96",
        "--no-albumentations", "--dropout", "0.35", "--min-lr", "1e-5",
        "--momentum", "0.85", "--checkpoint-freq", "5",
        "--save-best-only", "--weights", str(tmp_path / "w.npz"),
        "--no-pin-memory", "--debug",
    ])
    assert cfg.precision == "fp32"
    assert cfg.warmup_epochs == 2 and abs(cfg.warmup_ratio - 0.2) < 1e-9
    assert cfg.image_size == 96  # overrides the inferred 140
    assert cfg.use_albumentations is False
    assert cfg.dropout == 0.35 and cfg.min_lr == 1e-5
    assert cfg.momentum == 0.85
    assert cfg.checkpoint_freq == 5 and cfg.save_best_only is True
    assert cfg.weights == str(tmp_path / "w.npz")
    # model-name inference still rules when --image-size is absent
    assert parse_args(["--model", "ernet"]).image_size == 240


def test_pretrained_and_torchvision_augs(trained, aider_dir, tmp_path):
    """--pretrained starts from --weights: one extra epoch on the
    color-separable set keeps the learned accuracy (fresh 1-epoch runs
    start near chance), with the torchvision aug branch active."""
    import dataclasses

    from rtdm_tpu.cli.aider_train import train_model

    config = dataclasses.replace(
        trained[0], resume=False, epochs=1, pretrained=True,
        use_albumentations=False, augment=True,
        checkpoint_dir=str(tmp_path / "saves2"),
        log_dir=str(tmp_path / "logs2"))
    # weights already points at the 3-epoch run's final npz
    state, history = train_model(config)
    assert history["val_acc"][-1] >= 0.4  # kept the pretrained skill


def test_power_usage_cli(trained, aider_dir, tmp_path, capsys):
    """calculate-power-usage.py surface: fraction of the split, modelled
    energy report (getTotalEnergy:200-208), trace plot with event
    markers (showDataTraces:159-185)."""
    from rtdm_tpu.cli.power_usage import main

    config = trained[0]
    plot = str(tmp_path / "power.png")
    res = main(["--model", "squeeze-ernet",
                "--weights", config.weights,
                "--root-dir", str(aider_dir),
                "--test-split", str(aider_dir / "test.csv"),
                "--test-data-pc", "100", "--batch-size", "5",
                "--precision", "fp32", "--plot", plot])
    out = capsys.readouterr().out
    assert "total energy" in out and "energy/frame" in out
    assert res["frames"] == 5  # the 5-image test split
    assert res["total_j"] > 0 and res["mj_per_frame"] > 0
    assert os.path.exists(plot)
