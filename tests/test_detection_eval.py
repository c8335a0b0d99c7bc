"""Detection data + mAP pipeline tests, using the reference's bundled
mini-dataset (10 real images + labels) as fixtures."""

import os

import numpy as np
import pytest

from rtdm_tpu.data.odder import (
    DetectionBatchLoader,
    DetectionDataset,
    letterbox_image,
    load_names,
    parse_data_cfg,
)
from rtdm_tpu.eval.map import (
    DetectionEvaluator,
    ap_per_class,
    box_iou_np,
    compute_ap,
    match_predictions,
)
from tests.conftest import REFERENCE_ROOT, needs_reference

YOLO_DATA = REFERENCE_ROOT / "code/victim_localization/yolov3/data"


@needs_reference
def test_parse_data_cfg_and_names():
    d = parse_data_cfg(str(YOLO_DATA / "aider-min.data"))
    assert d["classes"] == "2"
    names = load_names(str(YOLO_DATA / "aider.names"))
    assert names == ["person", "vehicle"]


@needs_reference
def test_detection_dataset_real_fixtures():
    ds = DetectionDataset(str(YOLO_DATA / "custom/test-min.txt"), 416,
                          base_dir=str(YOLO_DATA.parent))
    assert len(ds) == 10
    assert ds.stats["found"] == 10
    s = ds.load(0)
    assert s["image"].shape == (416, 416, 3)
    n = int(s["num_labels"])
    assert n > 0
    lab = s["labels"][:n]
    assert set(np.unique(lab[:, 0])) <= {0.0, 1.0}
    # boxes live inside the letterboxed frame
    assert np.all(lab[:, 1] - lab[:, 3] / 2 >= -1.0)
    assert np.all(lab[:, 1] + lab[:, 3] / 2 <= 417.0)


@needs_reference
def test_detection_batch_loader_padding():
    ds = DetectionDataset(str(YOLO_DATA / "custom/test-min.txt"), 320,
                          base_dir=str(YOLO_DATA.parent))
    loader = DetectionBatchLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    last, valid = batches[-1]
    assert last["image"].shape == (4, 320, 320, 3)
    assert valid == 2
    assert np.all(last["image"][2:] == 0)


def test_letterbox_geometry():
    img = np.full((100, 200, 3), 50, np.uint8)
    out, gain, (pw, ph) = letterbox_image(img, 64)
    assert out.shape == (64, 64, 3)
    np.testing.assert_allclose(gain, 0.32)
    assert (pw, ph) == (0.0, 16.0)
    assert np.all(out[:16] == 114) and np.all(out[-16:] == 114)
    assert np.all(out[16:48] == 50)


def test_compute_ap_perfect_and_worst():
    # single TP out of one GT: perfect detector
    ap = compute_ap([1.0], [1.0])
    assert ap > 0.99
    ap0 = compute_ap([0.0], [0.0])
    assert ap0 < 0.02


def test_match_predictions_greedy():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    gt_cls = np.array([0, 0])
    pred = np.array([
        [0, 0, 10, 10, 0.9, 0],     # exact match gt0
        [1, 1, 11, 11, 0.8, 0],     # overlaps gt0 but gt0 consumed -> FP
        [20, 20, 30, 30, 0.7, 1],   # wrong class -> FP
        [21, 21, 31, 31, 0.6, 0],   # iou ~0.68 with gt1 -> TP @0.5
    ])
    tp = match_predictions(pred, gt, gt_cls, np.array([0.5]))
    np.testing.assert_array_equal(tp[:, 0], [True, False, False, True])


def test_ap_per_class_end_to_end():
    ev = DetectionEvaluator(2, np.array([0.5]))
    gt = np.array([[0, 0, 10, 10]], float)
    # image 1: perfect detection of class 0
    ev.add_image(np.array([[0, 0, 10, 10, 0.9, 0]]), gt, np.array([0]))
    # image 2: one miss (gt present, no det)
    ev.add_image(np.zeros((0, 6)), gt, np.array([0]))
    res = ev.results()
    assert 0.45 <= res["map50"] <= 0.55  # recall caps at 0.5
    assert res["mp"] == 1.0


def test_box_iou_np():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[5, 5, 15, 15], [0, 0, 10, 10]], float)
    iou = box_iou_np(a, b)
    np.testing.assert_allclose(iou[0], [25 / 175, 1.0], rtol=1e-6)


@needs_reference
def test_yolo_test_cli_runs_on_mini_dataset(capsys, tmp_path):
    """Full pipeline over the real mini dataset with random weights:
    pipeline must run end-to-end, report ~0 mAP (untrained), and write
    the test_batch{i}_{labels,pred}.jpg panels (yolov5/test.py:215-218)."""
    import os

    from rtdm_tpu.cli.yolo_test import main

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    plot_dir = str(tmp_path / "panels")
    res = main(["--cfg", cfg,
                "--data", str(YOLO_DATA / "aider-min.data"),
                "--img-size", "320", "--batch-size", "4",
                "--quant", "fp32", "--conf-thres", "0.3",
                "--plot-dir", plot_dir])
    out = capsys.readouterr().out
    assert "mAP@0.5" in out and "images 10" in out
    assert res["map50"] < 0.3  # untrained weights can't be good
    # 10 images / batch 4 -> 3 batches, first 3 plotted
    for i in range(3):
        assert os.path.exists(
            os.path.join(plot_dir, f"test_batch{i}_labels.jpg"))
        assert os.path.exists(
            os.path.join(plot_dir, f"test_batch{i}_pred.jpg"))


@needs_reference
def test_yolo_detect_cli_flags(tmp_path):
    """detect.py flag surface (yolov5/detect.py:155-176): --classes
    restricts every output row, --agnostic-nms + --max-det shape the NMS,
    --nosave suppresses annotated images, --save-txt --txt-format yolo
    --save-conf writes normalized 6-col label rows, --save-crop writes
    per-class crop files."""
    import glob as g
    import os

    from rtdm_tpu.cli.yolo_detect import main

    out = str(tmp_path / "det")
    src = str(YOLO_DATA / "custom/test/images")
    results = main([
        "--cfg", str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg"),
        "--source", src, "--output", out, "--img-size", "192",
        "--conf-thres", "0.05", "--quant", "fp32",
        "--classes", "0", "--agnostic-nms", "--max-det", "16",
        "--nosave", "--save-txt", "--txt-format", "yolo", "--save-conf",
        "--save-crop", "--hide-conf", "--line-thickness", "1",
    ])
    assert len(results) == 10
    assert g.glob(os.path.join(out, "*.jpg")) == []  # --nosave
    txts = sorted(g.glob(os.path.join(out, "labels", "*.txt")))
    assert len(txts) == 10
    rows = [line.split() for t in txts
            for line in open(t).read().split("\n") if line.strip()]
    assert rows, "random tiny-net at conf 0.05 must emit detections"
    for r in rows:
        assert len(r) == 6  # cls cx cy w h conf (--save-conf)
        assert r[0] == "0"  # --classes 0
        assert all(-0.5 <= float(v) <= 1.5 for v in r[1:5])  # normalized
    for _, det in results:
        assert len(det) <= 16  # --max-det
    # --save-crop: at least one crop under crops/<class>/
    assert g.glob(os.path.join(out, "crops", "*", "*.jpg"))


@needs_reference
def test_yolo_detect_cli_classify_veto(tmp_path):
    """--classify runs the apply_classifier second-stage veto
    (yolov5/detect.py:43-44,78-79): the run completes and every frame's
    surviving count is <= the unfiltered run's."""
    import os

    from rtdm_tpu.cli.yolo_detect import main

    cfg = str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg")
    src = sorted((YOLO_DATA / "custom/test/images").glob("*.jpg"))[0]
    common = ["--cfg", cfg, "--source", str(src), "--img-size", "192",
              "--conf-thres", "0.05", "--quant", "fp32", "--max-det", "8",
              "--nosave"]
    base = main(common + ["--output", str(tmp_path / "a")])
    cls_w = ("/root/reference/code/disaster_detection/weights/"
             "squeeze-ernet-state_dict.pt")
    if not os.path.exists(cls_w):
        import pytest
        pytest.skip("classifier checkpoint unavailable")
    veto = main(common + ["--output", str(tmp_path / "b"),
                          "--classify", "squeeze-ernet",
                          "--classifier-weights", cls_w])
    assert len(veto) == len(base) == 1
    assert len(veto[0][1]) <= len(base[0][1])


@needs_reference
def test_yolo_detect_cli_stream_mode(tmp_path, capsys):
    """Non-file sources run the camera loop (trt_yolo.py loop_and_detect
    :130-162): .streams listing, frame_{i} stems, EMA FPS readout,
    --max-frames bound."""
    from rtdm_tpu.cli.yolo_detect import main

    streams = tmp_path / "cams.streams"
    streams.write_text(f"{YOLO_DATA / 'custom/test/images'}\n")
    out = str(tmp_path / "det")
    results = main([
        "--cfg", str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg"),
        "--source", str(streams), "--output", out, "--img-size", "192",
        "--quant", "fp32", "--max-frames", "4", "--nosave",
    ])
    assert len(results) == 4
    assert results[0][0] == "frame_00000"
    assert "FPS" in capsys.readouterr().out


@needs_reference
def test_yolo_detect_cli_video_source(tmp_path, capsys):
    """A video-file source writes ONE annotated output video (fourcc codec,
    yolov3/detect.py:131-137) instead of per-frame jpgs, and
    --project/--name route the run dir through increment_path."""
    import glob as g

    import cv2
    from PIL import Image

    from rtdm_tpu.cli.yolo_detect import main

    imgs = sorted(g.glob(str(YOLO_DATA / "custom/test/images/*.jpg")))[:4]
    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (160, 120))
    for p in imgs:
        frame = np.asarray(Image.open(p).convert("RGB").resize((160, 120)))
        w.write(frame[:, :, ::-1])
    w.release()

    results = main([
        "--cfg", str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg"),
        "--source", vid, "--img-size", "192", "--quant", "fp32",
        "--project", str(tmp_path / "runs"), "--name", "exp",
    ])
    assert len(results) == 4
    out_vid = str(tmp_path / "runs" / "exp" / "in.mp4")
    assert os.path.exists(out_vid)
    assert not g.glob(str(tmp_path / "runs" / "exp" / "*.jpg"))
    cap = cv2.VideoCapture(out_vid)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 4
    assert "run dir:" in capsys.readouterr().out


@needs_reference
def test_yolo_test_save_txt_hybrid_verbose(capsys, tmp_path):
    """--save-txt/--save-conf/--save-hybrid write per-image normalized
    prediction txts with GT rows prepended (yolov5/test.py:120,145-151),
    and --verbose keeps the per-class table."""
    import glob as g
    import os

    from rtdm_tpu.cli.yolo_test import main

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    run = str(tmp_path / "run")
    main(["--cfg", cfg, "--data", str(YOLO_DATA / "aider-min.data"),
          "--img-size", "192", "--batch-size", "4", "--quant", "fp32",
          "--conf-thres", "0.3", "--verbose",
          "--save-txt", run, "--save-conf", "--save-hybrid"])
    out = capsys.readouterr().out
    assert "person" in out  # per-class table (--verbose)
    txts = sorted(g.glob(os.path.join(run, "labels", "*.txt")))
    assert len(txts) == 10
    ds = DetectionDataset(str(YOLO_DATA / "custom/test-min.txt"), 192,
                          base_dir=str(YOLO_DATA.parent))
    by_stem = {os.path.splitext(os.path.basename(p))[0]: lab
               for p, lab in zip(ds.image_paths, ds.labels)}
    for t in txts:
        stem = os.path.splitext(os.path.basename(t))[0]
        rows = [line.split() for line in open(t).read().split("\n")
                if line.strip()]
        gt = by_stem[stem]
        assert len(rows) >= len(gt)  # GT rows prepended (--save-hybrid)
        for r, want in zip(rows, gt):  # hybrid GT rows == dataset labels
            assert len(r) == 5  # GT rows carry no conf column
            np.testing.assert_allclose([float(v) for v in r],
                                       want, atol=1e-5)
        for r in rows[len(gt):]:
            assert len(r) == 6  # prediction rows: --save-conf appends conf


V5_ROOT = REFERENCE_ROOT / "code/victim_localization/yolov5"


@needs_reference
def test_yolo_test_project_name_run_dir(tmp_path, monkeypatch, capsys):
    """--project/--name/--exist-ok route outputs through the v5
    increment_path run-dir convention (yolov5/test.py:61-73) without
    changing the eval itself."""
    import rtdm_tpu.cli.yolo_test as yt

    seen = {}

    def fake_evaluate(*a, **kw):
        seen.update(kw)
        return {}

    monkeypatch.setattr(yt, "evaluate", fake_evaluate)
    base = tmp_path / "runs"
    for expected in ("exp", "exp2"):
        yt.main(["--cfg", "x.yaml", "--data", "d.yaml",
                 "--project", str(base), "--name", "exp", "--save-hybrid"])
        assert seen["plot_dir"] == str(base / expected)
        # evaluate() appends the labels/ leaf itself, so main must hand it
        # the run dir (txts land at save_dir/labels, not labels/labels)
        assert seen["save_txt_dir"] == str(base / expected)
        assert (base / expected).is_dir()
    # --exist-ok reuses exp instead of bumping to exp3
    yt.main(["--cfg", "x.yaml", "--data", "d.yaml", "--project", str(base),
             "--name", "exp", "--exist-ok"])
    assert seen["plot_dir"] == str(base / "exp")
    out = capsys.readouterr().out
    assert "run dir:" in out


def test_load_data_spec_both_formats():
    """load_data_spec unifies darknet .data (parse_config.py:55-71) and
    the v5 data yaml (data/aider.yaml consumed by train.py:71-77)."""
    from rtdm_tpu.data.odder import load_data_spec

    d = load_data_spec(str(YOLO_DATA / "aider-min.data"))
    assert d["classes"] == 2
    assert d["names"] == ["person", "vehicle"]
    assert d["base"].endswith("yolov3")
    y = load_data_spec(str(V5_ROOT / "data/aider.yaml"))
    assert y["classes"] == 2
    assert y["names"] == ["person", "car"]
    assert y["base"].endswith("yolov5")
    assert y["train"] == "dataset/train/images/"
    assert y["valid"] == "dataset/val/images/"


@needs_reference
def test_detection_dataset_from_directory_and_list():
    """DetectionDataset accepts the v5 yaml's directory (and
    list-of-sources) spellings, not just txt list files
    (yolov5/utils/datasets.py:368-384)."""
    from rtdm_tpu.data.odder import load_data_spec

    spec = load_data_spec(str(V5_ROOT / "data/aider.yaml"))
    ds = DetectionDataset(spec["valid"], 320, base_dir=spec["base"],
                          num_classes=2)
    assert len(ds) == 3 and ds.stats["found"] == 3
    s = ds.load(0)
    assert s["image"].shape == (320, 320, 3)
    assert int(s["num_labels"]) > 0
    # list-of-sources: train dir + val dir pooled
    both = DetectionDataset([spec["train"], spec["valid"]], 320,
                            base_dir=spec["base"], num_classes=2)
    assert len(both) == 4


@needs_reference
def test_yolo_test_cli_v5_data_yaml(capsys, tmp_path):
    """yolo_test runs end-to-end from the reference's own v5 data yaml
    (directory splits + inline names)."""
    from rtdm_tpu.cli.yolo_test import main

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    res = main(["--cfg", cfg, "--data", str(V5_ROOT / "data/aider.yaml"),
                "--img-size", "192", "--batch-size", "4",
                "--quant", "fp32", "--conf-thres", "0.3"])
    out = capsys.readouterr().out
    assert "mAP@0.5" in out and "images 3" in out
    assert "car" in out or res["map50"] <= 1.0


@needs_reference
def test_log_dataset_cli(capsys, tmp_path):
    """Dataset-artifact job (wandb_logging/log_dataset.py analogue):
    manifest counts match the fixture and the artifact is recorded."""
    import glob as g
    import json
    import os

    from rtdm_tpu.cli.log_dataset import main

    proj = str(tmp_path / "proj")
    res = main(["--data", str(V5_ROOT / "data/aider.yaml"),
                "--project", proj])
    assert res["nc"] == 2 and res["names"] == ["person", "car"]
    assert res["splits"]["train"]["images"] == 1
    assert res["splits"]["valid"]["images"] == 3
    assert res["splits"]["valid"]["labelled"] == 3
    assert sum(res["splits"]["valid"]["instances_per_class"]) > 0
    assert len(res["fingerprint"]) == 16
    art = os.path.join(proj, "aider-artifact.json")
    assert json.load(open(art))["fingerprint"] == res["fingerprint"]
    # the run log recorded the artifact event
    logs = g.glob(os.path.join(proj, "dataset.jsonl"))
    assert logs and any(json.loads(ln).get("event") == "artifact"
                        for ln in open(logs[0]))


def test_yolo_test_single_cls_collapses_pred_classes(tmp_path, monkeypatch):
    """--single-cls must zero the prediction class column like the GT side
    (yolov5/test.py:139-140 `pred[:, 5] = 0`): a pixel-perfect class-1
    detection on a (collapsed) class-0 GT scores mAP 1.0, not 0."""
    from PIL import Image

    import rtdm_tpu.cli.yolo_detect as yd
    import rtdm_tpu.export.detector as ed
    from rtdm_tpu.cli.yolo_test import evaluate

    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
        img_dir / "a.jpg")
    (lab_dir / "a.txt").write_text("0 0.5 0.5 0.5 0.5\n")
    (tmp_path / "valid.txt").write_text(str(img_dir / "a.jpg") + "\n")
    (tmp_path / "x.names").write_text("person\nvehicle\n")
    (tmp_path / "x.data").write_text(
        f"classes=2\nvalid={tmp_path / 'valid.txt'}\n"
        f"names={tmp_path / 'x.names'}\n")

    class FakeDetector:
        def __init__(self, model, variables, spec, batch_size=8, **kw):
            self.spec = spec
            self.num_classes = 2

        def __call__(self, images):
            b = images.shape[0]
            det = np.zeros((b, 8, 6), np.float32)
            det[:, 0] = [16, 16, 48, 48, 0.9, 1.0]  # exact GT box, class 1
            return det, np.ones((b,), np.int32)

    monkeypatch.setattr(ed, "Detector", FakeDetector)
    monkeypatch.setattr(yd, "load_weights_for_cfg",
                        lambda *a, **kw: (None, None))
    res = evaluate("fake.cfg", str(tmp_path / "x.data"), None, img_size=64,
                   batch_size=1, num_workers=0, single_cls=True)
    assert res["map50"] > 0.9, res


def test_check_anchors_survives_subpixel_labels():
    """The too-few-labels guard must count labels AFTER kmean_anchors'
    >=2px filter: 8 labels of which only 5 survive vs 6 anchors keeps the
    current set instead of raising at training startup."""
    from rtdm_tpu.train.autoanchor import check_anchors

    class TinyDs:
        # 5 clusterable labels + 3 sub-2px ones, normalized at img 416
        labels = [np.array([[0, .5, .5, .10, .12],
                            [0, .5, .5, .20, .18],
                            [0, .5, .5, .30, .25],
                            [0, .5, .5, .002, .002],
                            [0, .5, .5, .001, .003]], np.float32),
                  np.array([[0, .5, .5, .40, .35],
                            [0, .5, .5, .45, .50],
                            [0, .5, .5, .001, .001]], np.float32)]

        def __len__(self):
            return 2

    bad = np.array([[400, 10], [10, 400], [5, 5],
                    [416, 416], [1, 50], [50, 1]], np.float32)
    out, bpr, evolved = check_anchors(TinyDs(), bad, 416, gen=10)
    assert not evolved
    np.testing.assert_array_equal(out, bad)


def test_compute_ap_family_sentinels():
    """v3 and v5 use different AP sentinels (utils.py:218-220 vs
    metrics.py:88-91): with a top-ranked FP, v3's envelope starts at the
    max achieved precision while v5's starts at 1.0."""
    # [FP conf .9, TP conf .8], 1 GT -> recall [0, 1], precision [0, .5]
    recall, precision = [0.0, 1.0], [0.0, 0.5]
    ap_v3 = compute_ap(recall, precision, family="v3")
    ap_v5 = compute_ap(recall, precision, family="v5")
    assert ap_v5 > ap_v3  # v5's 1.0-precision sentinel inflates the head
    # both are ~0.5 (the TP segment), differing by the head/tail points
    assert 0.45 < ap_v3 < 0.55 and 0.45 < ap_v5 < 0.55
    # reference-exact values (transcribed sentinel formulas, 101-pt trapz)
    def ref_ap(mrec, mpre):
        mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
        x = np.linspace(0, 1, 101)
        return float(np.trapezoid(np.interp(x, mrec, mpre), x))
    want_v3 = ref_ap(np.array([0.0, 0.0, 1.0, 1.0]),
                     np.array([0.0, 0.0, 0.5, 0.0]))
    want_v5 = ref_ap(np.array([0.0, 0.0, 1.0, 1.01]),
                     np.array([1.0, 0.0, 0.5, 0.0]))
    assert ap_v3 == pytest.approx(want_v3, abs=1e-9)
    assert ap_v5 == pytest.approx(want_v5, abs=1e-9)
    # perfect detector: both conventions agree at ~1
    assert compute_ap([1.0], [1.0], family="v3") == pytest.approx(1.0,
                                                                  abs=0.02)


def test_ap_per_class_family_operating_points():
    """family='v3' reports P/R interpolated at conf 0.1 (utils.py:165),
    family='v5' at the shared best-mean-F1 grid point (metrics.py:78)."""
    # class 0: TP at conf .9, FP at conf .05 -> at conf 0.1: P=1, R=1
    tp = np.array([[True], [False]])
    conf = np.array([0.9, 0.05])
    cls = np.array([0, 0])
    tcls = np.array([0])
    v3 = ap_per_class(tp, conf, cls, tcls, 1, family="v3")
    # reference formula: P interpolated at conf 0.1 between the curve
    # points (conf .9, P 1.0) and (conf .05, P 0.5) -> ~0.529; R stays 1.0
    want_p = float(np.interp(-0.1, -conf, np.array([1.0, 0.5])))
    assert v3["p"][0, 0] == pytest.approx(want_p, abs=1e-9)
    assert v3["r"][0, 0] == pytest.approx(1.0)
    v5 = ap_per_class(tp, conf, cls, tcls, 1, family="v5")
    # v5's best-F1 grid point lands just before the FP enters: P~1, R=1
    # (1e-3 slack: the 1000-point conf grid interpolates, metrics.py:41)
    assert v5["p"][0, 0] == pytest.approx(1.0, abs=1e-3)
    assert v5["r"][0, 0] == pytest.approx(1.0, abs=1e-9)


def test_match_predictions_strict_threshold():
    """TP matching uses strict > (both references: `ious > iouv`): IoU
    exactly at the threshold is NOT a match."""
    gt = np.array([[0.0, 0.0, 1.0, 2.0]])
    # overlap box [0,0,1,1] vs gt [0,0,1,2]: inter 1, union 2 -> IoU 0.5
    pred = np.array([[0.0, 0.0, 1.0, 1.0, 0.9, 0.0]])
    tp = match_predictions(pred, gt, np.array([0]), np.array([0.5]))
    assert not tp.any()
    tp = match_predictions(pred, gt, np.array([0]), np.array([0.499]))
    assert tp.all()


@needs_reference
def test_yolo_test_ensemble_tta_save_json(tmp_path, capsys):
    """Two-member ensemble (attempt_load analogue) with --augment (TTA)
    and --save-json: members are pooled before one NMS pass, and the json
    records carry scale_coords'd ORIGINAL-pixel boxes with filename-stem
    image ids (yolov5/test.py:105,153-162)."""
    import json

    import jax

    from rtdm_tpu.cli.yolo_test import main
    from rtdm_tpu.models.darknet import (create_darknet, init_darknet,
                                         save_darknet_weights)

    cfg = str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg")
    model = create_darknet(cfg)
    paths = []
    for seed in (1, 2):
        variables = init_darknet(model, 192, seed=seed)
        p = str(tmp_path / f"m{seed}.weights")
        save_darknet_weights(variables, model.cfg_text, p)
        paths.append(p)
    del model, variables
    jj = str(tmp_path / "det.json")
    res = main(["--cfg", cfg, "--data", str(YOLO_DATA / "aider-min.data"),
                "--weights", ",".join(paths), "--img-size", "192",
                "--batch-size", "4", "--quant", "fp32",
                "--conf-thres", "0.05", "--augment", "--save-json", jj])
    out = capsys.readouterr().out
    assert "images 10" in out
    assert res["map50"] < 0.5  # random members can't be good
    records = json.load(open(jj))
    assert records, "random ensemble at conf 0.05 must emit detections"
    for r in records:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        # non-numeric stems stay strings (fire_image0232, ...)
        assert isinstance(r["image_id"], str)
        assert r["image_id"][0].isalpha()
    # boxes are in ORIGINAL pixels: the fixtures are ~500-620px wide, so
    # detections spread over the frame must exceed the 192px network frame
    assert max(r["bbox"][0] + r["bbox"][2] for r in records) > 192.0


@needs_reference
def test_yolo_test_ensemble_int8_rejected(tmp_path):
    """int8 ensembles are refused loudly: calibration scales are
    per-engine, so a silent weight-only fallback would misreport what
    '--quant int8' measures."""
    import pytest as _pytest

    from rtdm_tpu.cli.yolo_test import main

    cfg = str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg")
    with _pytest.raises(SystemExit, match="ENSEMBLE"):
        main(["--cfg", cfg, "--data", str(YOLO_DATA / "aider-min.data"),
              "--weights", "a.weights,b.weights", "--img-size", "192",
              "--quant", "int8"])


# ---------------------------------------------------------------------------
# Rectangular (aspect-ratio-bucketed) eval batches — datasets.py:285-316


def _rect_plan_oracle(wh, img_size, batch_size, stride, pad):
    """Independent transcription of the reference's rect shape logic
    (yolov3/utils/datasets.py:285-316; v5's `+ pad`, datasets.py:412-416),
    kept deliberately close to the torch loop's spelling."""
    s = np.asarray(wh, np.float64)
    ar = s[:, 1] / s[:, 0]
    irect = ar.argsort(kind="stable")
    ar = ar[irect]
    n = len(s)
    bi = np.floor(np.arange(n) / batch_size).astype(int)
    nb = bi[-1] + 1
    shapes = [[1, 1]] * nb
    for i in range(nb):
        ari = ar[bi == i]
        mini, maxi = ari.min(), ari.max()
        if maxi < 1:
            shapes[i] = [maxi, 1]
        elif mini > 1:
            shapes[i] = [1, 1 / mini]
    batch_shapes = (np.ceil(
        np.array(shapes) * img_size / stride + pad).astype(np.int64)
        * stride)
    return irect, batch_shapes


def test_rect_batch_plan_matches_reference_oracle():
    from rtdm_tpu.data.odder import rect_batch_plan

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 40))
        bs = int(rng.integers(1, 9))
        wh = rng.integers(100, 1400, size=(n, 2)).astype(np.float64)
        stride = int(rng.choice([32, 64]))
        pad = float(rng.choice([0.0, 0.5]))
        img = int(rng.choice([320, 416, 512]))
        order, shapes = rect_batch_plan(wh, img, bs, stride, pad)
        o_order, o_shapes = _rect_plan_oracle(wh, img, bs, stride, pad)
        np.testing.assert_array_equal(order, o_order)
        np.testing.assert_array_equal(shapes, o_shapes)
        # every bucket is a stride multiple no larger than the ceil'd max
        assert (shapes % stride == 0).all()
        assert (shapes <= np.ceil(img / stride + pad) * stride).all()


@needs_reference
def test_rect_dataset_buckets_and_labels():
    bs = 4
    ds = DetectionDataset(str(YOLO_DATA / "custom/test-min.txt"), 416,
                          base_dir=str(YOLO_DATA.parent),
                          rect=True, batch_size=bs)
    loader = DetectionBatchLoader(ds, bs, num_workers=2)
    seen = []
    bucket_pixels = 0
    for batch, valid in loader:
        h, w = batch["image"].shape[1:3]
        assert h % 32 == 0 and w % 32 == 0 and h <= 416 and w <= 416
        bucket_pixels += valid * h * w
        for i in range(valid):
            seen.append(int(batch["index"][i]))
            n = int(batch["num_labels"][i])
            lab = batch["labels"][i][:n]
            if n:  # boxes live inside THIS bucket's letterboxed frame
                assert np.all(lab[:, 1] + lab[:, 3] / 2 <= w + 1.0)
                assert np.all(lab[:, 2] + lab[:, 4] / 2 <= h + 1.0)
    assert sorted(seen) == list(range(10))  # every image exactly once
    # rect buckets must beat the square on padded pixels for this mixed-AR
    # set (that is the entire point)
    assert bucket_pixels < 10 * 416 * 416
    # shuffle is incompatible (datasets.py:278)
    with pytest.raises(ValueError, match="rect"):
        list(DetectionBatchLoader(ds, bs, shuffle=True, num_workers=1))
    with pytest.raises(ValueError, match="batch"):
        list(DetectionBatchLoader(ds, 2, num_workers=1))


@needs_reference
def test_yolo_test_cli_rect(capsys):
    """--rect end-to-end on the mini set: per-bucket compiled programs,
    same metric surface as the square run."""
    from rtdm_tpu.cli.yolo_test import main

    cfg = str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg")
    res = main(["--cfg", cfg, "--data", str(YOLO_DATA / "aider-min.data"),
                "--img-size", "320", "--batch-size", "4",
                "--quant", "fp32", "--conf-thres", "0.3", "--rect"])
    out = capsys.readouterr().out
    assert "rect buckets" in out and "images 10" in out
    assert res["map50"] <= 1.0


@needs_reference
def test_yolo_detect_cli_rect_video(tmp_path):
    """--rect on a constant-shape video source: ONE compiled rect program
    (the minimal stride rectangle for 160x120 at size 192 is 160x192, not
    the 192 square), detections mapped back to original pixels."""
    import glob as g

    import cv2
    from PIL import Image

    from rtdm_tpu.cli.yolo_detect import main
    from rtdm_tpu.data.odder import minimal_rect_shape

    assert minimal_rect_shape(120, 160, 192) == (160, 192)
    assert minimal_rect_shape(720, 1280, 416) == (256, 416)
    assert minimal_rect_shape(416, 416, 416) == (416, 416)

    imgs = sorted(g.glob(str(YOLO_DATA / "custom/test/images/*.jpg")))[:3]
    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (160, 120))
    for p in imgs:
        frame = np.asarray(Image.open(p).convert("RGB").resize((160, 120)))
        w.write(frame[:, :, ::-1])
    w.release()

    results = main([
        "--cfg", str(YOLO_DATA.parent / "cfg/yolov3-tiny-aider-416.cfg"),
        "--source", vid, "--img-size", "192", "--quant", "fp32",
        "--rect", "--conf-thres", "0.05",
        "--output", str(tmp_path / "out"), "--nosave",
    ])
    assert len(results) == 3
    for _, det in results:  # boxes live in ORIGINAL (160x120) pixels
        for x1, y1, x2, y2, conf, cls in det:
            assert -1 <= x1 <= 161 and -1 <= y1 <= 121
            assert x2 <= 161 and y2 <= 121


def test_rect_shapes_cache_roundtrip(tmp_path, rng):
    """The rect plan persists header sizes as <list>.shapes (the
    reference's shapefile, datasets.py:287-295) and reloads them; stale
    row counts trigger recompute."""
    from PIL import Image

    from rtdm_tpu.data.odder import DetectionDataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    sizes = [(100, 80), (60, 120), (90, 90)]
    paths = []
    for i, (h, w) in enumerate(sizes):
        p = img_dir / f"im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    lst = tmp_path / "val.txt"
    lst.write_text("\n".join(paths) + "\n")

    ds = DetectionDataset(str(lst), 64, base_dir=str(tmp_path),
                          rect=True, batch_size=2)
    sp = tmp_path / "val.shapes"
    assert sp.exists()
    cached = np.loadtxt(str(sp), ndmin=2)
    np.testing.assert_allclose(cached, [(80, 100), (120, 60), (90, 90)])
    # reload uses the cache (poison it to prove the read path)
    np.savetxt(str(sp), [(80, 100), (120, 60), (90, 91)], fmt="%g")
    ds2 = DetectionDataset(str(lst), 64, base_dir=str(tmp_path),
                           rect=True, batch_size=2)
    assert ds2.rect_wh[2][1] == 91
    # wrong row count -> recomputed and rewritten
    np.savetxt(str(sp), [(80, 100)], fmt="%g")
    ds3 = DetectionDataset(str(lst), 64, base_dir=str(tmp_path),
                           rect=True, batch_size=2)
    assert len(ds3.rect_wh) == 3 and ds3.rect_wh[2][1] == 90


def test_rect_eval_gain_capped_to_nominal_size(tmp_path, rng):
    """v5-style pad-inflated buckets keep gain = img_size/max(h,w): the
    image is NOT upscaled into the surplus; labels land accordingly."""
    from PIL import Image

    from rtdm_tpu.data.odder import DetectionDataset

    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir(); lab_dir.mkdir()
    p = img_dir / "im0.jpg"
    Image.fromarray(
        rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)).save(p)
    # centered full-width box
    (lab_dir / "im0.txt").write_text("0 0.5 0.5 1.0 1.0\n")
    lst = tmp_path / "val.txt"
    lst.write_text(str(p) + "\n")
    ds = DetectionDataset(str(lst), 64, base_dir=str(tmp_path),
                          num_classes=2, rect=True, batch_size=1,
                          stride=32, rect_pad=0.5)  # bucket 96x96 > 64
    assert ds.rect_shapes[0] == (96, 96)
    s = ds.load(0)
    assert s["image"].shape == (96, 96, 3)
    lab = s["labels"][0]
    # gain capped at 64/128=0.5 -> box w is 64 px, centered in 96
    np.testing.assert_allclose(lab[3], 64.0, atol=0.6)
    np.testing.assert_allclose(lab[1], 48.0, atol=0.6)
    # the 16-px borders are pure padding
    assert (s["image"][:16] == 114).all()
    assert (s["image"][:, :16] == 114).all()
