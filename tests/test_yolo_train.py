"""End-to-end YOLO training smoke tests on the reference mini-dataset."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, needs_reference

YOLO_DIR = REFERENCE_ROOT / "code/victim_localization/yolov3"


@needs_reference
def test_augmented_dataset_loads():
    from rtdm_tpu.data.odder import DetectionDataset

    ds = DetectionDataset(str(YOLO_DIR / "data/custom/test-min.txt"), 320,
                          base_dir=str(YOLO_DIR), train=True)
    rng = np.random.default_rng(0)
    s = ds.load(0, rng)
    assert s["image"].shape == (320, 320, 3)
    assert s["labels"].shape == (100, 5)
    # mosaic samples combine several images; labels land inside the frame
    n = int(s["num_labels"])
    if n:
        lab = s["labels"][:n]
        assert np.all(lab[:, 1] >= 0) and np.all(lab[:, 1] <= 320)
        assert np.all(lab[:, 3] > 0) and np.all(lab[:, 4] > 0)


@needs_reference
def test_mosaic_determinism():
    from rtdm_tpu.data.odder import DetectionDataset

    ds = DetectionDataset(str(YOLO_DIR / "data/custom/test-min.txt"), 256,
                          base_dir=str(YOLO_DIR), train=True)
    a = ds.load(1, np.random.default_rng(5))
    b = ds.load(1, np.random.default_rng(5))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["labels"], b["labels"])


@needs_reference
def test_yolo_train_two_epochs(tmp_path):
    """2 epochs of yolov3-tiny training on the 10 labelled mini images:
    losses must be NONZERO finite, checkpoints written, mAP eval runs.
    (Trains on the test-min list — the shipped train-min list has a single
    unlabelled image, which would make this test vacuous.)"""
    from rtdm_tpu.cli.yolo_train import main

    out = str(tmp_path / "run")
    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),  # resolves base
        "--epochs", "2", "--batch-size", "4", "--img-size", "256",
        "--nominal-batch", "4", "--burn-in", "2", "--lr0", "0.002",
        "--num-workers", "2", "--output", out, "--eval-every", "1",
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--save-period", "2",
    ])
    hist = result["history"]
    assert len(hist) == 2
    losses = np.array([h["loss"] for h in hist])
    assert np.all(np.isfinite(losses))
    assert losses[0][1] > 0, "obj loss must be nonzero (training ran)"
    assert hist[-1]["map50"] is not None
    assert os.path.exists(os.path.join(out, "last.npz"))
    assert os.path.exists(os.path.join(out, "best.npz"))
    # --save-period 2 over 2 epochs → exactly one periodic backup
    # (yolov3/train.py:368-369 backup%g.pt analogue), loadable like last.npz
    assert os.path.exists(os.path.join(out, "backup2.npz"))
    assert not os.path.exists(os.path.join(out, "backup1.npz"))
    from rtdm_tpu.models.io import load_variables
    bk = load_variables(os.path.join(out, "backup2.npz"))
    assert "params" in bk and "batch_stats" in bk
    assert os.path.exists(os.path.join(out, "results.txt"))
    # observability artifacts (yolov5/train.py:226,299-303,398 surface)
    assert os.path.exists(os.path.join(out, "labels.png"))
    assert os.path.exists(os.path.join(out, "train_batch0.jpg"))
    assert os.path.exists(os.path.join(out, "results.png"))


@needs_reference
def test_tiny_train_list_cycles_to_full_batch():
    """The shipped train-min.txt has ONE image; the loader must cycle it
    into a full fixed-shape batch rather than yield zero batches."""
    from rtdm_tpu.data.odder import DetectionBatchLoader, DetectionDataset

    ds = DetectionDataset(str(YOLO_DIR / "data/custom/train-min.txt"), 128,
                          base_dir=str(YOLO_DIR), train=False)
    assert len(ds) == 1
    loader = DetectionBatchLoader(ds, batch_size=4, shuffle=True,
                                  drop_last=True, num_workers=1)
    batches = list(loader)
    assert len(batches) == 1
    batch, valid = batches[0]
    assert batch["image"].shape[0] == 4
    assert valid == 4


@needs_reference
def test_prebias_freezes_non_head_params(tmp_path):
    """During --prebias epochs only the detection-head conv biases move
    (regression: optax.masked passes unmasked grads through as raw
    updates unless the complement is zeroed)."""
    import jax
    import numpy as np

    from rtdm_tpu.cli.yolo_train import main
    from rtdm_tpu.models.io import load_variables

    out = str(tmp_path / "pb")
    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "1", "--prebias", "1", "--batch-size", "4",
        "--img-size", "192", "--nominal-batch", "4", "--burn-in", "2",
        "--num-workers", "2", "--output", out, "--eval-every", "1",
        "--seed", "3", "--no-plots",
    ])
    # reconstruct the init to compare: same cfg+seed-0 init inside the CLI
    from rtdm_tpu.models.darknet import create_darknet, init_darknet
    model = create_darknet(str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"))
    init_vars = jax.device_get(init_darknet(model, 192))
    trained = jax.device_get(result["params"])
    # a backbone kernel must be untouched after a prebias-only run
    np.testing.assert_array_equal(
        np.asarray(init_vars["params"]["l0_conv"]["kernel"]),
        np.asarray(trained["l0_conv"]["kernel"]))
    # head conv biases must have moved
    assert not np.allclose(
        np.asarray(init_vars["params"]["l15_conv"]["bias"]),
        np.asarray(trained["l15_conv"]["bias"]))


@needs_reference
def test_yolo_train_resume(tmp_path):
    """Killed-and-resumed runs continue from the checkpointed epoch with
    optimizer+EMA state (yolov3/train.py:352-369,427): a 2-epoch run
    resumed to 4 has the same epoch count as an uninterrupted 4-epoch run,
    and its first two history rows are the restored ones."""
    from rtdm_tpu.cli.yolo_train import main

    def run(out, epochs, extra=()):
        return main([
            "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
            "--data", str(YOLO_DIR / "data/aider-min.data"),
            "--train-list-override",
            str(YOLO_DIR / "data/custom/test-min.txt"),
            "--epochs", str(epochs), "--batch-size", "4",
            "--img-size", "192", "--nominal-batch", "4", "--burn-in", "2",
            "--lr0", "0.002", "--num-workers", "2", "--output", out,
            "--eval-every", "1", "--no-plots", *extra,
        ])

    out_b = str(tmp_path / "resumed")
    part = run(out_b, 2, ["--no-strip"])  # simulates an interrupted run
    assert os.path.isdir(os.path.join(out_b, "last_state"))
    resumed = run(out_b, 4, ["--resume"])
    assert len(part["history"]) == 2
    assert len(resumed["history"]) == 4
    np.testing.assert_allclose(
        [h["loss"] for h in resumed["history"][:2]],
        [h["loss"] for h in part["history"]], rtol=1e-6)
    # completed run strips the optimizer state (general.py:587 analogue)
    assert not os.path.isdir(os.path.join(out_b, "last_state"))
    losses = np.array([h["loss"] for h in resumed["history"]])
    assert np.all(np.isfinite(losses))


@needs_reference
def test_yolo_train_nosave_notest(tmp_path):
    """--nosave defers all weight/checkpoint writes to the final epoch and
    --notest defers the mAP eval the same way (yolov5/train.py:346,361):
    a 2-epoch run ends with last.npz + a final eval but no intermediate
    mAP rows, and the completed run is still stripped."""
    from rtdm_tpu.cli.yolo_train import main

    out = str(tmp_path / "nsrun")
    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "2", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--lr0", "0.002", "--num-workers", "2",
        "--output", out, "--eval-every", "1", "--nosave", "--notest",
        "--no-plots",
    ])
    hist = result["history"]
    assert len(hist) == 2
    # --notest: only the final epoch carries an eval despite --eval-every 1
    assert hist[0]["map50"] is None and hist[-1]["map50"] is not None
    assert os.path.exists(os.path.join(out, "last.npz"))
    # completed run never leaves the resumable optimizer state behind
    assert not os.path.isdir(os.path.join(out, "last_state"))


@needs_reference
def test_yolo_train_nonfinite_abort(tmp_path):
    """A diverging run (absurd lr) must abort on the first non-finite loss
    instead of burning the epoch budget (yolov3/train.py:284-286)."""
    from rtdm_tpu.cli.yolo_train import main

    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "50", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--burn-in", "1", "--lr0", "1e30",
        "--optimizer", "sgd", "--num-workers", "2", "--no-plots",
        "--output", str(tmp_path / "nan"), "--eval-every", "50",
    ])
    assert len(result["history"]) < 50, "run must abort, not finish"


V5_MINI_YAML = """
nc: 2
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10,13, 16,30, 33,23]
  - [30,61, 62,45, 59,119]
backbone:
  [[-1, 1, Focus, [16, 3]],
   [-1, 1, Conv, [32, 3, 2]],
   [-1, 1, C3, [32]],
   [-1, 1, Conv, [64, 3, 2]],
   [-1, 1, SPP, [64, [3, 5]]],
  ]
head:
  [[-1, 1, Conv, [32, 1, 1]],
   [[4, 5], 1, Detect, [nc, anchors]],
  ]
"""


@needs_reference
def test_yolo_train_v5_warmup_ema(tmp_path):
    """v5 training path: warmup lr/momentum interpolation (train.py:281-290)
    + EMA folded into the jitted step must run and stay finite."""
    from rtdm_tpu.cli.yolo_train import main

    yml = tmp_path / "mini.yaml"
    yml.write_text(V5_MINI_YAML)
    result = main([
        "--cfg", str(yml),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "2", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--lr0", "0.01", "--optimizer", "sgd",
        "--ema", "--num-workers", "2", "--no-plots",
        "--output", str(tmp_path / "v5run"), "--eval-every", "1",
    ])
    losses = np.array([h["loss"] for h in result["history"]])
    assert losses.shape[0] == 2 and np.all(np.isfinite(losses))
    assert result["history"][-1]["map50"] is not None
    # v5 evals over the full IoU vector so fitness can weight
    # mAP@0.5:0.95 by 0.9 (metrics.py:12-15); map <= map50 by definition
    last = result["history"][-1]
    assert last["map"] is not None and last["map"] <= last["map50"] + 1e-9


@needs_reference
def test_bn_burn_in_with_multi_scale(tmp_path):
    """BN burn-in and multi-scale apply TOGETHER (yolov3/train.py:250-275):
    burn steps must draw multi-scale sizes too, and while every step of the
    run is a burn step the BN running stats stay at their init values
    (track_running_stats off; batch stats still normalize the forward)."""
    import jax

    from rtdm_tpu.cli.yolo_train import main

    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "2", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--burn-in", "2", "--lr0", "0.002",
        "--multi-scale", "--bn-burn-in", "1000", "--num-workers", "2",
        "--output", str(tmp_path / "ms"), "--eval-every", "0", "--seed", "5",
        "--no-plots",
    ])
    losses = np.array([h["loss"] for h in result["history"]])
    assert losses.shape[0] == 2 and np.all(np.isfinite(losses))
    stats = jax.device_get(result["batch_stats"])
    bn = stats["l0_bn"]
    np.testing.assert_array_equal(np.asarray(bn["mean"]),
                                  np.zeros_like(np.asarray(bn["mean"])))
    np.testing.assert_array_equal(np.asarray(bn["var"]),
                                  np.ones_like(np.asarray(bn["var"])))


def test_yolo_train_indivisible_accumulate(tmp_path):
    """--batch-size 10 with the default nominal batch 64 used to crash
    (round(64/10)=6 microbatches cannot split a 10-frame batch); the
    accumulate count must clamp to a divisor of the batch."""
    from rtdm_tpu.cli.yolo_train import main

    out = str(tmp_path / "run")
    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--epochs", "1", "--batch-size", "10", "--img-size", "192",
        "--burn-in", "2", "--lr0", "0.002", "--num-workers", "2",
        "--output", out, "--eval-every", "0", "--no-plots",
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
    ])
    assert np.all(np.isfinite(np.array(result["history"][0]["loss"])))


def test_check_anchor_order_flips_descending():
    """check_anchor_order (yolo.py:105-112): big-anchors-first layouts are
    flipped to match stride-ascending levels; correct layouts pass through."""
    from rtdm_tpu.train.autoanchor import check_anchor_order

    asc = np.array([[[10, 13], [16, 30]], [[60, 60], [80, 90]]], np.float32)
    np.testing.assert_array_equal(check_anchor_order(asc), asc)
    np.testing.assert_array_equal(check_anchor_order(asc[::-1]), asc)


@needs_reference
def test_yolo_train_v5_autoanchor_evolves(tmp_path):
    """Pathological yaml anchors (300px squares on a small-box dataset)
    must trip the train-start BPR check (yolov5/train.py:213-216): the run
    evolves a better set and writes model-autoanchor.yaml with it."""
    import yaml as _yaml

    from rtdm_tpu.cli.yolo_train import main

    bad = V5_MINI_YAML.replace(
        "  - [10,13, 16,30, 33,23]\n  - [30,61, 62,45, 59,119]",
        "  - [290,290, 300,300, 310,310]\n  - [320,320, 330,330, 340,340]")
    assert bad != V5_MINI_YAML
    yml = tmp_path / "bad-anchors.yaml"
    yml.write_text(bad)
    out = tmp_path / "aarun"
    main([
        "--cfg", str(yml),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "1", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--lr0", "0.01", "--optimizer", "sgd",
        "--num-workers", "2", "--no-plots",
        "--output", str(out), "--eval-every", "0",
    ])
    saved = out / "model-autoanchor.yaml"
    assert saved.exists(), "evolved anchors must be persisted as a yaml"
    # the yaml must live in the SAME run dir as the checkpoints — writing
    # it before the run dir was resolved used to bump increment_path to
    # aarun2 and split the artifacts
    assert (out / "last.npz").exists()
    assert not (tmp_path / "aarun2").exists()
    d = _yaml.safe_load(saved.read_text())
    evolved = np.array(d["anchors"], np.float32).reshape(-1, 2)
    assert evolved.max() < 290  # moved off the pathological prior
    # the saved yaml is a valid model: small->large area across levels
    lv = np.array(d["anchors"], np.float32).reshape(2, -1, 2)
    assert lv[0].prod(-1).mean() <= lv[1].prod(-1).mean()


@needs_reference
def test_yolo_train_single_cls_v5(tmp_path):
    """--single-cls trains a 1-class v5 head over all labels
    (yolov5/train.py:77-78,473)."""
    from rtdm_tpu.cli.yolo_train import main

    yml = tmp_path / "mini.yaml"
    yml.write_text(V5_MINI_YAML)
    result = main([
        "--cfg", str(yml),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "1", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--lr0", "0.01", "--optimizer", "sgd",
        "--num-workers", "2", "--no-plots", "--noautoanchor",
        "--single-cls", "--output", str(tmp_path / "scrun"),
        "--eval-every", "1",
    ])
    losses = np.array([h["loss"] for h in result["history"]])
    assert np.all(np.isfinite(losses))
    assert result["history"][-1]["map50"] is not None


@needs_reference
def test_yolo_train_single_cls_darknet_cfg_mismatch(tmp_path):
    """A 2-class darknet cfg cannot run --single-cls — nc is baked into
    the [yolo] blocks; the CLI must fail loudly, not silently mis-train."""
    import pytest

    from rtdm_tpu.cli.yolo_train import main

    with pytest.raises(SystemExit, match="1"):
        main([
            "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
            "--data", str(YOLO_DIR / "data/aider-min.data"),
            "--train-list-override",
            str(YOLO_DIR / "data/custom/test-min.txt"),
            "--epochs", "1", "--batch-size", "4", "--img-size", "192",
            "--single-cls", "--no-plots",
            "--output", str(tmp_path / "bad"),
        ])


@needs_reference
def test_yolo_train_v5_linear_lr(tmp_path):
    """--linear-lr swaps the v5 one_cycle cosine for the linear lf
    (yolov5/train.py:136-137); --label-smoothing overrides the hyp value
    (train.py:228). Run must train and stay finite."""
    from rtdm_tpu.cli.yolo_train import main

    yml = tmp_path / "mini.yaml"
    yml.write_text(V5_MINI_YAML)
    result = main([
        "--cfg", str(yml),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "1", "--batch-size", "4", "--img-size", "192",
        "--nominal-batch", "4", "--lr0", "0.01", "--optimizer", "sgd",
        "--num-workers", "2", "--no-plots", "--noautoanchor",
        "--linear-lr", "--label-smoothing", "0.1",
        "--output", str(tmp_path / "linrun"),
        "--eval-every", "0",
    ])
    losses = np.array([h["loss"] for h in result["history"]])
    assert np.all(np.isfinite(losses))
    assert losses[0][2] > 0, "smoothed cls BCE must be nonzero"


@needs_reference
def test_yolo_train_reference_flag_aliases(tmp_path):
    """Reference flag spellings map onto the TPU trainer: --adam ==
    --optimizer adam (yolov3 --adam), --accumulate N overrides the
    --nominal-batch derivation (yolov3 --accumulate), --workers ==
    --num-workers (yolov5:482), --project/--name/--exist-ok resolve the
    run dir (yolov5:484-486), --sync-bn is a documented no-op (BN stats
    are already global under GSPMD)."""
    from rtdm_tpu.cli.yolo_train import main, parse_args

    a = parse_args(["--cfg", "x.cfg", "--adam", "--workers", "3",
                    "--project", str(tmp_path / "proj"), "--name", "run"])
    assert a.optimizer == "adam"
    assert a.num_workers == 3
    assert a.output == str(tmp_path / "proj" / "run")

    out = str(tmp_path / "proj2" / "exp")
    os.makedirs(out)  # taken: without --exist-ok this would become exp2
    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", str(YOLO_DIR / "data/aider-min.data"),
        "--train-list-override", str(YOLO_DIR / "data/custom/test-min.txt"),
        "--epochs", "1", "--batch-size", "4", "--img-size", "192",
        "--accumulate", "2", "--adam", "--lr0", "0.002", "--workers", "2",
        "--project", str(tmp_path / "proj2"), "--exist-ok", "--sync-bn",
        "--eval-every", "0", "--no-plots",
    ])
    losses = np.array([h["loss"] for h in result["history"]])
    assert np.all(np.isfinite(losses))
    assert os.path.exists(os.path.join(out, "last.npz"))  # not exp2/


@needs_reference
def test_yolo_train_v5_data_yaml(tmp_path):
    """Training consumes the reference's v5 data yaml (directory splits,
    inline names — yolov5/data/aider.yaml via train.py:71-77): one epoch
    over the bundled dataset/ fixture must produce finite losses and the
    usual artifacts."""
    from rtdm_tpu.cli.yolo_train import main

    yaml_path = str(YOLO_DIR.parent / "yolov5/data/aider.yaml")
    out = str(tmp_path / "run")
    result = main([
        "--cfg", str(YOLO_DIR / "cfg/yolov3-tiny-aider-416.cfg"),
        "--data", yaml_path,
        "--epochs", "1", "--batch-size", "2", "--img-size", "192",
        "--nominal-batch", "2", "--burn-in", "1", "--lr0", "0.002",
        "--num-workers", "2", "--output", out, "--eval-every", "1",
        "--no-plots",
    ])
    hist = result["history"]
    assert len(hist) == 1
    assert np.all(np.isfinite(np.array(hist[0]["loss"])))
    assert hist[-1]["map50"] is not None  # eval over the 3 val-dir images
    assert os.path.exists(os.path.join(out, "last.npz"))
