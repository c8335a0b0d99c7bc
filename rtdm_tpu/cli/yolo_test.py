"""YOLO mAP evaluation CLI.

Parity with yolov3/test.py:11-197: run the valid split from a .data file,
report P / R / mAP@0.5 / F1 (+ optional mAP@0.5:0.95) per class and overall
with inference+NMS timing. `--task benchmark` sweeps image sizes and IoU
thresholds like test.py:224-231.

Run: python -m rtdm_tpu.cli.yolo_test --cfg ... --data .../aider-min.data \
         --weights model.weights
"""

from __future__ import annotations

import argparse
import os
import time


def evaluate(cfg: str, data: str, weights: str, img_size: int = 416,
             batch_size: int = 32, conf_thres: float = 0.001,
             iou_thres: float = 0.6, map_iou: float = 0.5,
             quant: str = "bf16", num_workers: int = 8,
             full_map_range: bool = False, save_json: str = "",
             confusion: bool = False, iouv_override=None,
             plot_dir: str = "", single_cls: bool = False,
             augment: bool = False, verbose: bool = False,
             save_txt_dir: str = "", save_conf: bool = False,
             save_hybrid: bool = False, rect: bool = False):
    import numpy as np

    from rtdm_tpu.cli.yolo_detect import load_weights_for_cfg
    from rtdm_tpu.data.odder import (DetectionBatchLoader, DetectionDataset,
                                     load_data_spec)
    from rtdm_tpu.eval.map import (DetectionEvaluator, scale_coords_np,
                                   xywh_to_xyxy_np)
    from rtdm_tpu.export.detector import Detector, DetectorSpec

    if rect and augment:
        raise SystemExit("--rect and --augment are mutually exclusive "
                         "(the TTA pyramid is square)")
    dcfg = load_data_spec(data)  # darknet .data OR yolov5 data yaml
    base = str(dcfg["base"])
    names = list(dcfg.get("names") or [])
    nc_data = int(dcfg.get("classes", len(names) or 2))
    # --single-cls evaluation (yolov5/test.py:29,78): all labels
    # collapse to class 0
    nc = 1 if single_cls else nc_data
    if single_cls:
        names = ["item"]
    # per-family metric conventions (AP sentinels + reported-P/R operating
    # point): yolov3 vs yolov5 diverge — see eval/map.py ap_per_class
    family = "v5" if cfg.endswith((".yaml", ".yml")) else "v3"
    # --rect: aspect-ratio-bucketed batches (yolov5's test-time default,
    # yolov5/test.py:91 rect=True pad=0.5; the reference's v3 eval is
    # square-only, yolov3/test.py:59 rect=False — for v3 cfgs this is an
    # opt-in efficiency mode) — each bucket shape compiles once
    # eval_scaleup: v5's load_image upscales images smaller than img_size
    # at eval (yolov5/utils/datasets.py:645); v3 only ever scales down
    # (yolov3/utils/datasets.py:517) — gated here alongside rect_pad.
    ds = DetectionDataset(dcfg["valid"], img_size, base_dir=base,
                          num_classes=nc_data, single_cls=single_cls,
                          rect=rect, batch_size=batch_size,
                          rect_pad=(0.5 if family == "v5" else 0.0),
                          eval_scaleup=(family == "v5"))
    if rect and ds.rect_shapes:
        shapes = sorted(set(ds.rect_shapes))
        print(f"rect buckets ({len(shapes)} compiled shapes): "
              + " ".join(f"{h}x{w}" for h, w in shapes))
    loader = DetectionBatchLoader(ds, batch_size, num_workers=num_workers)
    # multi_label=True is the reference's test-time default whenever nc > 1
    # (yolov3/test.py:111 via utils.py:488, yolov5/test.py:122); the same
    # line passes agnostic=single_cls, and --augment rides the detector's
    # TTA path (test.py:106 model(img, augment=augment))
    spec = DetectorSpec(cfg_name=os.path.basename(cfg), img_size=img_size,
                        conf_thres=conf_thres, iou_thres=iou_thres,
                        quant=quant, multi_label=True, tta=augment,
                        class_agnostic=single_cls)
    weight_list = (weights.split(",") if weights and "," in weights
                   else [weights])
    if len(weight_list) > 1:
        if rect:
            raise SystemExit("--rect is not supported with weight "
                             "ensembles (the pooled program is compiled "
                             "for the square shape)")
        # model ensemble (yolov5/models/experimental.py Ensemble /
        # attempt_load): every member's decoded predictions are pooled
        # before ONE NMS pass, all inside a single compiled program.
        detector = _build_ensemble(cfg, weight_list, spec, batch_size)
    else:
        model, variables = load_weights_for_cfg(cfg, weights, img_size)
        act_scales = None
        if quant == "int8":
            # activation calibration over the eval split's first frames —
            # the YOLOEntropyCalibrator flow (calibrator.py:125-142), so
            # `--quant int8` measures an honestly-calibrated int8 engine
            from rtdm_tpu.quant.calibrate import calibrate_detector
            n_cal = min(32, len(ds))
            from rtdm_tpu.data.odder import letterbox_image
            # calibration always letterboxes square (rect buckets have
            # mixed shapes; activation ranges don't care about padding)
            # but applies the SAME family-gated gain cap as the eval path
            # so the calibration distribution matches the input
            # distribution it represents (v3: no upscale; v5: uncapped)
            calib_cap = None if family == "v5" else 1.0
            calib = np.stack([letterbox_image(ds.load_raw(i), img_size,
                                              gain_cap=calib_cap)[0]
                              for i in range(n_cal)])
            act_scales = calibrate_detector(model, variables, calib)
            print(f"int8: {len(act_scales)} activation scales calibrated "
                  f"on {n_cal} images")
        detector = Detector(model, variables, spec, batch_size=batch_size,
                            act_scales=act_scales)

    if iouv_override is not None:
        # study mode: detection runs ONCE; the IoU sweep is pure host-side
        # matching (the reference re-runs the whole eval per threshold,
        # test.py:233-255 — here the thresholds are just extra columns)
        iouv = np.asarray(iouv_override, np.float64)
    else:
        iouv = (np.linspace(0.5, 0.95, 10) if full_map_range
                else np.array([map_iou]))
    ev = DetectionEvaluator(nc, iouv, family=family)
    from rtdm_tpu.eval.map import DetectionConfusionMatrix
    cm = DetectionConfusionMatrix(nc) if confusion else None
    # Compile + first dispatch happen OUTSIDE the timed bracket (the first
    # TPU compile is ~20-60s over the dev tunnel; letting it amortize into
    # ms/img was VERDICT r4's "eval is 1600x slower than inference" and
    # the entire "int8 eval 1.9x slower" anomaly — the int8 program just
    # takes longer to COMPILE). The reference brackets steady-state
    # inference/NMS the same way (yolov3/test.py:95-112,187-189).
    warm_shapes = (sorted(set(ds.rect_shapes))
                   if rect and ds.rect_shapes else [(img_size, img_size)])
    t0 = time.perf_counter()
    if hasattr(detector, "warmup"):
        detector.warmup(warm_shapes)
    else:  # ensemble callable — square program only
        detector(np.zeros((batch_size, img_size, img_size, 3), np.uint8))
    t_warm = time.perf_counter() - t0

    t_infer = 0.0   # device wait: dispatch + materialize (infer+NMS)
    t_host = 0.0    # host-side matching / txt / json
    n_images = 0
    json_records = []

    def _dispatch(images):
        """Enqueue without materializing when the detector supports it —
        the device computes batch k+1 while the host matches batch k."""
        if hasattr(detector, "submit"):
            return detector.submit(images)
        det, count = detector(images)  # ensemble path: already numpy
        return det, count, images.shape[0]

    def _finish(handle, batch, valid, bi):
        nonlocal t_infer
        det_d, count_d, _ = handle
        t0 = time.perf_counter()
        det_full = np.asarray(det_d, np.float32)
        count_full = np.asarray(count_d)
        t_infer += time.perf_counter() - t0
        _process(det_full, count_full, batch, valid, bi)

    def _process(det, count, batch, valid, bi):
        nonlocal n_images, t_host
        th0 = time.perf_counter()
        if plot_dir and bi < 3:
            # test_batch{i}_{labels,pred}.jpg panels (yolov3/test.py:81-83,
            # yolov5/test.py:215-218)
            from rtdm_tpu.utils.plots import plot_detection_batch
            os.makedirs(plot_dir, exist_ok=True)
            imgs = batch["image"][:valid]
            plot_detection_batch(
                imgs, batch["labels"][:valid], batch["num_labels"][:valid],
                os.path.join(plot_dir, f"test_batch{bi}_labels.jpg"), names)
            d6 = det[:valid]
            pred_rows = np.stack([d6[:, :, 5],
                                  (d6[:, :, 0] + d6[:, :, 2]) / 2,
                                  (d6[:, :, 1] + d6[:, :, 3]) / 2,
                                  d6[:, :, 2] - d6[:, :, 0],
                                  d6[:, :, 3] - d6[:, :, 1]], axis=-1)
            plot_detection_batch(
                imgs, pred_rows, np.asarray(count[:valid]),
                os.path.join(plot_dir, f"test_batch{bi}_pred.jpg"), names,
                scores=d6[:, :, 4])
        for i in range(valid):
            n = int(count[i])
            d = det[i][:n]
            if single_cls:
                # collapse the prediction class column like the GT side
                # (yolov5/test.py:139-140 `pred[:, 5] = 0`): without this a
                # multi-class model's non-0 detections could never match
                d = d.copy()
                d[:, 5] = 0.0
            nl = int(batch["num_labels"][i])
            lab = batch["labels"][i][:nl]
            gt_boxes = xywh_to_xyxy_np(lab[:, 1:5])
            ev.add_image(d, gt_boxes, lab[:, 0].astype(np.int32))
            if cm is not None:
                cm.process_batch(d, gt_boxes, lab[:, 0].astype(np.int32))
            idx = int(batch["index"][i])
            oh, ow = (int(batch["orig_hw"][i][0]),
                      int(batch["orig_hw"][i][1]))
            if (save_txt_dir or save_json) and n:
                # letterbox shape = the actual batch shape (the square, or
                # this batch's rect bucket); gain/pad come from the
                # dataset's applied letterbox (ratio_pad, test.py:137) —
                # a recomputed fit is wrong whenever the no-upscale cap
                # or a pad-inflated rect bucket bound the gain
                lb_shape = (batch["image"].shape[1], batch["image"].shape[2])
                g, pw, ph = (float(x) for x in batch["letterbox"][i])
                predn = scale_coords_np(d, lb_shape, (oh, ow),
                                        ratio_pad=(g, (pw, ph)))
            else:
                predn = d
            if save_txt_dir:
                # per-image prediction txts in normalized native-frame
                # `cls cx cy w h [conf]` rows (yolov5/test.py:145-151);
                # --save-hybrid prepends the GT label rows — the
                # auto-labelling union (test.py:120 'for autolabelling')
                lab_dir = os.path.join(save_txt_dir, "labels")
                os.makedirs(lab_dir, exist_ok=True)
                stem = os.path.splitext(
                    os.path.basename(ds.image_paths[idx]))[0]
                with open(os.path.join(lab_dir, f"{stem}.txt"), "w") as f:
                    if save_hybrid:
                        for row in ds.labels[idx]:
                            f.write(f"{int(row[0]):g} {row[1]:g} "
                                    f"{row[2]:g} {row[3]:g} {row[4]:g}\n")
                    for x1, y1, x2, y2, conf, c in predn:
                        line = (f"{int(c):g} {(x1 + x2) / 2 / ow:g} "
                                f"{(y1 + y2) / 2 / oh:g} "
                                f"{(x2 - x1) / ow:g} {(y2 - y1) / oh:g}")
                        if save_conf:
                            line += f" {conf:g}"
                        f.write(line + "\n")
            if save_json:
                # COCO-style detection records (yolov5/test.py:153-162):
                # boxes scale_coords'd back to ORIGINAL pixels, image_id
                # from the filename stem (int when numeric)
                stem = os.path.splitext(
                    os.path.basename(ds.image_paths[idx]))[0]
                img_id = int(stem) if stem.isnumeric() else stem
                for x1, y1, x2, y2, conf, c in predn:
                    json_records.append({
                        "image_id": img_id,
                        "category_id": int(c),
                        "bbox": [round(float(x1), 2), round(float(y1), 2),
                                 round(float(x2 - x1), 2),
                                 round(float(y2 - y1), 2)],
                        "score": round(float(conf), 5)})
            n_images += 1
        t_host += time.perf_counter() - th0

    # double-buffered eval loop: dispatch batch k+1, then finish (fetch +
    # match) batch k while the device computes — the reference's
    # synchronous load->infer->match loop serializes these
    # (yolov3/test.py:90-161)
    pending = None
    t_wall0 = time.perf_counter()
    for bi, (batch, valid) in enumerate(loader):
        handle = _dispatch(batch["image"][:batch_size])
        if pending is not None:
            _finish(*pending)
        pending = (handle, batch, valid, bi)
    if pending is not None:
        _finish(*pending)
    t_wall = time.perf_counter() - t_wall0

    if save_json:
        import json
        with open(save_json, "w") as f:
            json.dump(json_records, f)
        print(f"wrote {len(json_records)} detections to {save_json}")

    res = ev.results()
    ms = t_infer / max(n_images, 1) * 1e3          # device wait (infer+NMS)
    ms_host = t_host / max(n_images, 1) * 1e3      # host matching/IO
    ms_wall = t_wall / max(n_images, 1) * 1e3      # includes data loading
    print(f"images {n_images}  P {res['mp']:.3f}  R {res['mr']:.3f}  "
          f"mAP@{iouv[0]:g} {res['map50']:.3f}"
          + (f"  mAP@0.5:0.95 {res['map']:.3f}" if full_map_range else "")
          + f"  {ms:.2f} ms/img infer+NMS ({1000 / max(ms, 1e-9):.1f} FPS)")
    print(f"  timing: warmup/compile {t_warm:.1f}s (excluded), "
          f"host match {ms_host:.2f} ms/img, "
          f"wall {ms_wall:.2f} ms/img ({1000 / max(ms_wall, 1e-9):.1f} "
          "FPS incl. loading)")
    if iouv_override is not None and len(iouv) > 1 and res["per_class"]:
        present = res["per_class"]["classes"]
        if len(present):
            per_t = res["per_class"]["ap"][present].mean(axis=0)
            print("  " + "  ".join(f"mAP@{t:g} {m:.3f}"
                                   for t, m in zip(iouv, per_t)))
    if cm is not None:
        hdr = [*(names[:nc] if names else map(str, range(nc))), "background"]
        print("confusion (rows=pred, cols=true):")
        print("  " + " ".join(f"{h:>12}" for h in hdr))
        for i, row in enumerate(cm.matrix):
            print(f"  {hdr[i]:>12} " + " ".join(f"{v:>12d}" for v in row))
    # per-class table printed when --verbose or few classes, like
    # yolov5/test.py:235 `(verbose or nc < 50) and nc > 1`
    pc = res.get("per_class")
    if pc is not None and (verbose or nc < 50) and nc > 1:
        for c in pc["classes"]:
            cname = names[c] if c < len(names) else str(c)
            print(f"  {cname:>12}: P {pc['p'][c, 0]:.3f} "
                  f"R {pc['r'][c, 0]:.3f} AP {pc['ap'][c, 0]:.3f}")
    return res


def _build_ensemble(cfg, weight_list, spec, batch_size):
    """Fused multi-checkpoint detector: decode each member, concat, NMS."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtdm_tpu.export.detector import load_detection_model
    from rtdm_tpu.ops.nms import batched_nms
    from rtdm_tpu.ops.yolo import decode_all

    if spec.quant == "int8":
        raise SystemExit(
            "--quant int8 is not supported for weight ENSEMBLES: "
            "calibration scales are per-engine; build per-member int8 "
            "engines with cli/build_engine instead")
    dtype = (jnp.bfloat16 if spec.quant in ("bf16", "fp16")
             else jnp.float32)

    def _cast(variables):  # bf16 members actually compute in bf16
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, variables)

    members = []
    for w in weight_list:
        model, variables, heads = load_detection_model(cfg, w,
                                                       spec.img_size)
        members.append((model,
                        {"params": _cast(variables["params"]),
                         "batch_stats": variables.get("batch_stats", {})},
                        heads))

    def member_preds(x, size):
        preds = []
        for model, variables, heads in members:
            raw = model.apply(variables, x, train=False)
            preds.append(decode_all(raw, heads, size))
        return jnp.concatenate(preds, axis=1)

    def fwd(u8):
        x = u8.astype(dtype) / 255.0
        if spec.tta:
            # the SAME TTA pooling as the single-model Detector (the
            # reference runs ensembles with augment=opt.augment,
            # yolov5/test.py:105) — shared helper, not a re-transcription
            from rtdm_tpu.export.detector import tta_pooled_pred
            pred = tta_pooled_pred(member_preds, x, spec.img_size)
        else:
            pred = member_preds(x, spec.img_size)
        return batched_nms(pred, spec.conf_thres, spec.iou_thres,
                           spec.max_det, spec.top_k,
                           multi_label=spec.multi_label,
                           class_agnostic=spec.class_agnostic,
                           method=spec.nms_method,
                           classes=spec.classes)

    s_ = spec.img_size
    compiled = (jax.jit(fwd)
                .lower(jax.ShapeDtypeStruct((batch_size, s_, s_, 3),
                                            jnp.uint8)).compile())

    def call(images_u8):
        n = images_u8.shape[0]
        if n < batch_size:
            pad = np.zeros((batch_size - n,) + images_u8.shape[1:],
                           images_u8.dtype)
            images_u8 = np.concatenate([images_u8, pad])
        det, count = compiled(jnp.asarray(images_u8))
        return np.asarray(det)[:n], np.asarray(count)[:n]

    return call


def main(argv=None):
    p = argparse.ArgumentParser(description="YOLO mAP evaluation on TPU")
    p.add_argument("--cfg", required=True)
    p.add_argument("--data", required=True, help="darknet .data file")
    p.add_argument("--weights",
                   help="weights file, or comma-separated list for an\n                        ensemble (attempt_load analogue)")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--batch-size", type=int, default=32,
                   help="eval batch (raised from the reference's 8, "
                        "yolov5/test.py:20 — large batches amortize "
                        "dispatch; smaller final batches zero-pad)")
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--map-iou", type=float, default=0.5)
    p.add_argument("--single-cls", action="store_true",
                   help="evaluate as single-class: every GT label maps to "
                        "class 0 (yolov5/test.py:29,78)")
    p.add_argument("--rect", action="store_true",
                   help="rectangular eval batches: images bucketed by "
                        "aspect ratio, each bucket letterboxed to its own "
                        "stride-multiple shape and compiled once "
                        "(yolov5/test.py:91 rect=True, pad=0.5; the "
                        "reference's v3 eval is square-only, "
                        "yolov3/test.py:59 rect=False). Less padded "
                        "compute; default off to keep square-eval goldens")
    p.add_argument("--augment", action="store_true",
                   help="augmented (TTA) inference — multi-scale + flip "
                        "(yolov5/test.py:106,276)")
    p.add_argument("--verbose", action="store_true",
                   help="always report mAP by class (yolov5/test.py:235,277;"
                        " few-class runs print it regardless)")
    p.add_argument("--save-txt", default="", metavar="DIR",
                   help="write per-image prediction txts (normalized "
                        "`cls cx cy w h`) to DIR/labels "
                        "(yolov5/test.py:145-151,278)")
    p.add_argument("--save-conf", action="store_true",
                   help="append the confidence column to --save-txt rows "
                        "(test.py:280)")
    p.add_argument("--save-hybrid", action="store_true",
                   help="prepend GT label rows to each --save-txt file — "
                        "the label+prediction auto-labelling union "
                        "(test.py:279); implies --save-txt into the run "
                        "dir if none given")
    p.add_argument("--full-map-range", action="store_true",
                   help="report mAP@0.5:0.95 (v5-style)")
    p.add_argument("--quant", default="bf16",
                   choices=["fp32", "bf16", "fp16", "int8"])
    p.add_argument("--confusion", action="store_true",
                   help="print the IoU-matched confusion matrix")
    p.add_argument("--save-json", default="",
                   help="write COCO-format detection json here")
    p.add_argument("--task", default="test",
                   choices=["test", "benchmark", "study", "speed"])
    p.add_argument("--study-plot", default="study.png")
    p.add_argument("--plot-dir", default="",
                   help="write test_batch{i}_{labels,pred}.jpg panels for "
                        "the first 3 batches here (yolov5/test.py:215-218)")
    p.add_argument("--project", default=None,
                   help="v5 run-dir convention: outputs go to "
                        "project/name{,2,3...} (yolov5/test.py:61-63)")
    p.add_argument("--name", default=None, help="run name under --project")
    p.add_argument("--exist-ok", action="store_true",
                   help="reuse project/name without incrementing")
    args = p.parse_args(argv)
    from rtdm_tpu.utils.checks import check_img_size
    args.img_size = check_img_size(args.img_size)

    if args.project is not None or args.name is not None:
        # v5 save-dir convention (test.py:73 increment_path(project/name)):
        # batch panels land in the run dir, --save-txt/--save-hybrid labels
        # under its labels/ subdir, unless explicitly routed elsewhere
        from rtdm_tpu.utils.paths import increment_path
        save_dir = increment_path(
            os.path.join(args.project or "runs/test", args.name or "exp"),
            exist_ok=args.exist_ok)
        os.makedirs(save_dir, exist_ok=True)
        args.plot_dir = args.plot_dir or save_dir
        if (args.save_hybrid or args.save_conf) and not args.save_txt:
            # evaluate() appends the labels/ leaf itself, so pass the run
            # dir — txts land at save_dir/labels (not labels/labels)
            args.save_txt = save_dir
        print(f"run dir: {save_dir}")

    if args.task == "speed":
        # speed benchmark (yolov5/test.py:309-311): each weight runs the
        # normal eval at the deploy thresholds conf 0.25 / iou 0.45
        results = []
        for w in (args.weights.split(",") if args.weights else [None]):
            print(f"--- speed: {w} ---")
            results.append(evaluate(
                args.cfg, args.data, w, args.img_size, args.batch_size,
                0.25, 0.45, args.map_iou, args.quant,
                single_cls=args.single_cls))
        return results
    if args.task == "study":  # test.py:233-255's iou-threshold sweep + plot
        import numpy as np
        ious = np.arange(0.4, 0.95, 0.05)
        # ONE detection pass; the sweep is just extra matching thresholds
        res = evaluate(args.cfg, args.data, args.weights, args.img_size,
                       args.batch_size, args.conf_thres, args.iou_thres,
                       float(ious[0]), args.quant, iouv_override=ious)
        pc = res["per_class"]  # None when no image produced a detection
        present = pc["classes"] if pc else []
        maps = (pc["ap"][present].mean(axis=0).tolist() if len(present)
                else [0.0] * len(ious))
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot(ious, maps, marker="o")
        ax.set_xlabel("mAP IoU threshold")
        ax.set_ylabel("mAP")
        ax.grid(alpha=0.3)
        fig.savefig(args.study_plot, dpi=110, bbox_inches="tight")
        print(f"study plot: {args.study_plot}")
        return list(zip(ious.tolist(), maps))
    if args.task == "benchmark":  # test.py:224-231's size x iou sweep
        for size in (320, 416, 512, 608):
            print(f"--- img {size} (mAP columns: iou 0.5, 0.7) ---")
            # both matching IoUs ride ONE detection pass per size (the
            # sweep is host-side; only the image size needs a recompile)
            evaluate(args.cfg, args.data, args.weights, size,
                     args.batch_size, args.conf_thres, args.iou_thres,
                     0.5, args.quant, iouv_override=[0.5, 0.7])
        return None
    # v5 yaml models report mAP@0.5:0.95 by default — yolov5/test.py:53
    # always evaluates the full IoU vector; darknet keeps the yolov3
    # mAP@0.5-only default (yolov3/test.py:53-54) unless asked
    full_range = (args.full_map_range
                  or args.cfg.endswith((".yaml", ".yml")))
    save_txt_dir = args.save_txt or ("runs/test" if args.save_hybrid else "")
    return evaluate(args.cfg, args.data, args.weights, args.img_size,
                    args.batch_size, args.conf_thres, args.iou_thres,
                    args.map_iou, args.quant,
                    full_map_range=full_range,
                    save_json=args.save_json, confusion=args.confusion,
                    plot_dir=args.plot_dir, single_cls=args.single_cls,
                    augment=args.augment, verbose=args.verbose,
                    save_txt_dir=save_txt_dir, save_conf=args.save_conf,
                    save_hybrid=args.save_hybrid, rect=args.rect)


if __name__ == "__main__":
    main()
