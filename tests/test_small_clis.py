"""Smoke + behavior tests for the small utility CLIs: create_splits
(dataloaders/create_splits.py analogue), gen_txts (yolov3/data/gen-txts.py),
img_verify (yolov5/img-verify.py), pth_to_weights (yolov3/pth_to_weights.py).
"""

import csv
import os

import numpy as np
import pytest

TINY_CFG = """
[net]
width=64
height=64

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=21
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,13,  16,30,  33,23
classes=2
num=3
"""


def test_create_splits_stratified(tmp_path):
    """70/20/10 split is stratified per class, a disjoint cover of the
    input, and deterministic under the seed (create_splits.py:8-176)."""
    from rtdm_tpu.cli.create_splits import main

    labels = tmp_path / "labels.csv"
    rows = [(f"img_{c}_{i}.jpg", c) for c in range(3)
            for i in range(40 if c == 0 else 20)]
    with open(labels, "w", newline="") as f:
        csv.writer(f).writerows(rows)

    out = tmp_path / "splits"
    splits = main(["--labels", str(labels), "--output-dir", str(out),
                   "--prefix", "aider", "--plot"])
    assert (out / "class_distribution.png").exists()
    for name, want_len in zip(("train", "val", "test"), (56, 16, 8)):
        path = out / f"aider_{name}.csv"
        assert path.exists()
        got = list(csv.reader(open(path)))
        assert len(got) == want_len
    # stratified: class 0 has twice the rows of classes 1/2 in every split
    for split, fracs in zip(splits, (0.7, 0.2, 0.1)):
        counts = np.bincount([lbl for _, lbl in split], minlength=3)
        assert counts[0] == round(40 * fracs)
        assert counts[1] == counts[2] == round(20 * fracs)
    # disjoint cover
    all_paths = [p for split in splits for p, _ in split]
    assert sorted(all_paths) == sorted(p for p, _ in rows)
    # deterministic
    again = main(["--labels", str(labels), "--output-dir",
                  str(tmp_path / "splits2")])
    assert [sorted(s) for s in again] == [sorted(s) for s in splits]


def test_gen_txts_list_and_relative(tmp_path):
    from PIL import Image

    from rtdm_tpu.cli.gen_txts import main

    imgs = tmp_path / "images"
    imgs.mkdir()
    for name in ("b.jpg", "a.png", "c.txt", "d.JPG"):
        if name.endswith(".txt"):
            (imgs / name).write_text("not an image")
        else:
            Image.new("RGB", (4, 4)).save(imgs / name)
    out = tmp_path / "list.txt"
    paths = main(["--images", str(imgs), "--output", str(out),
                  "--relative-to", str(tmp_path)])
    assert paths == ["images/a.png", "images/b.jpg", "images/d.JPG"]
    assert out.read_text().splitlines() == paths


def test_img_verify_finds_and_deletes_corrupt(tmp_path):
    from PIL import Image

    from rtdm_tpu.cli.img_verify import main

    good = tmp_path / "good.jpg"
    Image.new("RGB", (8, 8)).save(good)
    corrupt = tmp_path / "bad.jpg"
    corrupt.write_bytes(good.read_bytes()[:20])  # truncated header
    not_img = tmp_path / "notes.txt"
    not_img.write_text("skip me")

    bad = main(["--root", str(tmp_path)])
    assert bad == [str(corrupt)]
    assert corrupt.exists()  # scan-only by default
    bad = main(["--root", str(tmp_path), "--delete"])
    assert bad == [str(corrupt)] and not corrupt.exists()
    assert good.exists() and not_img.exists()


def test_pth_to_weights_roundtrip(tmp_path):
    """npz -> darknet .weights -> npz through the CLI preserves every
    parameter (the convert() round-trip, yolov3/pth_to_weights.py:1-25)."""
    import jax

    from rtdm_tpu.cli.pth_to_weights import main
    from rtdm_tpu.export.detector import load_detection_model
    from rtdm_tpu.models.io import load_variables, save_variables

    cfg = tmp_path / "tiny.cfg"
    cfg.write_text(TINY_CFG)
    model, variables, _ = load_detection_model(str(cfg), None, 64)
    src = tmp_path / "src.npz"
    save_variables(str(src), jax.device_get(variables))

    w = tmp_path / "conv.weights"
    main(["--cfg", str(cfg), "--input", str(src), "--output", str(w),
          "--img-size", "64"])
    assert w.exists() and w.stat().st_size > 0

    back = tmp_path / "back.npz"
    main(["--cfg", str(cfg), "--input", str(w), "--output", str(back),
          "--img-size", "64"])
    orig = load_variables(str(src))
    got = load_variables(str(back))
    flat_o = jax.tree_util.tree_leaves_with_path(orig)
    flat_g = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(got)}
    assert flat_g, "round-tripped variables empty"
    for k, v in flat_o:
        np.testing.assert_allclose(flat_g[jax.tree_util.keystr(k)], v,
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k))


def test_power_monitor_step_energy_not_trapezoid():
    """Energy integrates the idle/busy STEP trace: a host-side gap between
    busy spans is charged at idle watts, not the (idle+busy)/2 ramp a
    trapezoid would give."""
    from rtdm_tpu.utils.profiler import PowerMonitor, PowerSample

    mon = PowerMonitor(chip_watts=170.0, idle_watts=30.0)
    # hand-built trace: 1s busy, 10s idle gap, 1s busy
    mon.samples = [PowerSample(0.0, 170.0), PowerSample(1.0, 30.0),
                   PowerSample(11.0, 170.0), PowerSample(12.0, 30.0)]
    want = 170.0 * 1 + 30.0 * 10 + 170.0 * 1
    assert mon.get_total_energy() == pytest.approx(want)


def test_training_config_explicit_values_and_replace():
    """Explicit image_size is respected, squeeze batch-doubling happens
    exactly once (dataclasses.replace must not re-double), and model-name
    matching is case-insensitive."""
    import dataclasses

    from rtdm_tpu.core.config import TrainingConfig

    c = TrainingConfig(model="squeeze-ernet", image_size=320, batch_size=16)
    assert c.image_size == 320           # explicit value kept
    assert c.batch_size == 32            # doubled once (reference config.py)
    c2 = dataclasses.replace(c, epochs=5)
    assert c2.batch_size == 32           # NOT re-doubled
    assert TrainingConfig(model="ERNET").image_size == 240  # case-insens.
    assert TrainingConfig(model="squeeze-ernet").image_size == 140


def test_profile_model_cli_per_layer_table(tmp_path, capsys):
    """profile_model (forward_once(profile=True) analogue, yolo.py:142-150):
    one row per plan layer, layer params sum to the model total, conv
    FLOPs deltas are positive, and the printed table has a total line."""
    import jax

    from rtdm_tpu.cli.profile_model import main as profile_main

    yml = tmp_path / "tiny.yaml"
    yml.write_text(
        "nc: 2\ndepth_multiple: 1.0\nwidth_multiple: 1.0\n"
        "anchors:\n  - [10,13, 16,30, 33,23]\n"
        "backbone:\n"
        "  [[-1, 1, Conv, [16, 3, 2]],\n"
        "   [-1, 1, Conv, [32, 3, 2]],\n"
        "   [-1, 1, C3, [32]],\n"
        "  ]\n"
        "head:\n"
        "  [[[-1], 1, Detect, [nc, anchors]]]\n")
    rows = profile_main(["--cfg", str(yml), "--img-size", "64",
                         "--iters", "2"])
    assert [r["module"] for r in rows] == ["Conv", "Conv", "C3", "Detect"]
    # params per layer sum to the model total
    from rtdm_tpu.models.yolov5 import create_yolov5
    import jax.numpy as jnp
    import numpy as np

    model = create_yolov5(str(yml))
    v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    total = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
    assert sum(r["params"] for r in rows) == total
    assert all(r["flops"] > 0 for r in rows if r["module"] != "Detect")
    out = capsys.readouterr().out
    assert "total" in out and "GFLOPs" in out


def test_attempt_download_resolves_and_gates(tmp_path, monkeypatch):
    """Reference-parity weight resolution (yolov3/models.py:553-572):
    existing paths pass through, basenames resolve against the search
    dirs, and a KNOWN missing name raises an error naming the published
    mirror instead of a bare FileNotFoundError (no egress here)."""
    import pytest
    from rtdm_tpu.utils import downloads
    from rtdm_tpu.utils.downloads import attempt_download

    f = tmp_path / "w.weights"
    f.write_bytes(b"x")
    assert attempt_download(str(f)) == str(f)
    assert attempt_download(None) is None
    # basename search-path resolution
    monkeypatch.setattr(downloads, "SEARCH_PATHS", (str(tmp_path),))
    assert attempt_download("elsewhere/w.weights") == str(f)
    # known-but-absent name: offline error names the mirror
    with pytest.raises(FileNotFoundError) as e:
        attempt_download(str(tmp_path / "missing" / "yolov3-tiny.weights"))
    assert "pjreddie.com" in str(e.value)
    # unknown name: defer to the loader's own error
    out = attempt_download("nope/unknown-model.weights")
    assert out == "nope/unknown-model.weights"
