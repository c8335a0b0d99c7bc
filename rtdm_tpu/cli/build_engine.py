"""Engine-build CLI — the torch2trt / onnx_to_tensorrt analogue.

Mirrors build_tensorrt_model.py's CLI shape (model + quant choice, max
batch, verification inference, artifact directory) and
onnx_to_tensorrt.py's int8 calibration flow (a directory of calibration
jpgs, calibrator.py:125-142).

Run: python -m rtdm_tpu.cli.build_engine --model squeeze-ernet \
         --weights .../squeeze-ernet-state_dict.pt --quant bf16 \
         --output engines/squeeze-ernet-bf16
"""

from __future__ import annotations

import argparse
import glob
import os
import time


def load_calib_images(calib_dir: str, image_size: int, limit: int = 256):
    import numpy as np
    from rtdm_tpu.cli.aider_predict import load_image_rgb, preprocess

    paths = sorted(
        p for pat in ("*.jpg", "*.jpeg", "*.png")
        for p in glob.glob(os.path.join(calib_dir, pat)))[:limit]
    if not paths:
        raise FileNotFoundError(f"no calibration images in {calib_dir}")
    return np.concatenate(
        [preprocess(load_image_rgb(p), image_size) for p in paths], axis=0)


def load_detector_calib_images(calib_dir: str, img_size: int,
                               limit: int = 256):
    """Letterboxed uint8 calibration frames for detector int8 engines
    (the calib_images/ flow of calibrator.py:125-142). JPEG dirs go
    through the native pooled batch decoder (one ctypes call for the
    whole set); failures and non-JPEGs fall back per image to PIL."""
    import numpy as np
    from rtdm_tpu.cli.aider_predict import load_image_rgb
    from rtdm_tpu.data.odder import letterbox_image

    paths = sorted(
        p for pat in ("*.jpg", "*.jpeg", "*.png")
        for p in glob.glob(os.path.join(calib_dir, pat)))[:limit]
    if not paths:
        raise FileNotFoundError(f"no calibration images in {calib_dir}")

    from rtdm_tpu.data import native_io
    res = (native_io.decode_batch(paths, img_size)
           if all(p.lower().endswith((".jpg", ".jpeg")) for p in paths)
           else None)
    if res is not None:
        batch, _, _, _, ok = res
        if ok.all():
            return batch
        batch = np.array(batch)  # writable copy for the fallback slots
        for i in np.flatnonzero(~ok):
            batch[i] = letterbox_image(load_image_rgb(paths[i]),
                                       img_size)[0]
        return batch
    return np.stack([letterbox_image(load_image_rgb(p), img_size)[0]
                     for p in paths])


def main(argv=None):
    p = argparse.ArgumentParser(description="Build an rtdm_tpu engine")
    p.add_argument("--model", default="squeeze-ernet",
                   choices=["ernet", "squeeze-ernet", "squeeze-redconv"])
    p.add_argument("--cfg", help="build a DETECTOR engine from this "
                   "darknet .cfg / v5 .yaml instead of a classifier")
    p.add_argument("--img-size", type=int, default=416,
                   help="detector input size")
    p.add_argument("--num-classes", type=int, default=None,
                   help="override the model DSL's class count (v5 yamls "
                   "default to nc:80; pass the trained nc, e.g. 2)")
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--weights", required=True,
                   help="weights to convert (.pt/.npz/.weights)")
    p.add_argument("--quant", default="bf16",
                   choices=["fp32", "bf16", "fp16", "int8"])
    p.add_argument("--batch-size", type=int, default=256,
                   help="engine max batch (TRT max_batch_size analogue)")
    p.add_argument("--calib-dir", help="calibration image dir (int8)")
    p.add_argument("--calib-method", default="percentile",
                   choices=["percentile", "entropy"])
    p.add_argument("--sealed", action="store_true",
                   help="int8 detector engines: store int8 weight codes + "
                   "scales with BN folded (a precision-sealed artifact "
                   "like a .trt file, ~4x smaller; fp32 masters not kept)")
    p.add_argument("--output", required=True, help="engine output dir")
    args = p.parse_args(argv)

    if args.sealed:
        # fail fast: sealing is int8-detector-only, and building first
        # would waste a full TPU compile before the save refuses
        if not args.cfg:
            raise SystemExit("--sealed applies to detector engines "
                             "(--cfg); classifier engines keep fp32 "
                             "masters")
        if args.quant != "int8":
            raise SystemExit("--sealed requires --quant int8")

    if args.cfg:  # detector engine (engines/*.trt analogue)
        from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                              save_detector)
        spec = DetectorSpec(cfg_name=os.path.basename(args.cfg),
                            img_size=args.img_size,
                            conf_thres=args.conf_thres,
                            iou_thres=args.iou_thres, quant=args.quant,
                            calib_method=args.calib_method)
        calib = None
        if args.quant == "int8":
            if not args.calib_dir:
                raise SystemExit("--calib-dir is required for int8 engines")
            calib = load_detector_calib_images(args.calib_dir, args.img_size)
            print(f"calibrating activations on {calib.shape[0]} images "
                  f"({args.calib_method})...")
        t0 = time.time()
        det = build_detector(args.cfg, args.weights, spec,
                             batch_size=args.batch_size,
                             num_classes=args.num_classes,
                             calib_images=calib)
        print(f"detector engine built in {time.time() - t0:.1f}s")
        save_detector(det, args.output, sealed=args.sealed)
        print(f"saved to {args.output} (spec.json + model.txt + "
              f"{'SEALED int8 ' if args.sealed else ''}params.npz"
              f"{' + act_scales.npz' if args.quant == 'int8' else ''})")
        return

    from rtdm_tpu.export.engine import build_engine
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.io import load_variables

    variables = load_variables(args.weights)
    model = create_model(args.model)

    calib = None
    if args.quant == "int8":
        if not args.calib_dir:
            raise SystemExit("--calib-dir is required for int8 engines")
        calib = load_calib_images(args.calib_dir, model.image_size)
        print(f"calibrating on {calib.shape[0]} images "
              f"({args.calib_method})...")

    t0 = time.time()
    engine = build_engine(args.model, variables, quant=args.quant,
                          batch_size=args.batch_size, calib_images=calib,
                          calib_method=args.calib_method)
    print(f"engine built + verified in {time.time() - t0:.1f}s")
    engine.save(args.output)
    print(f"saved to {args.output} "
          f"(spec.json + params.npz"
          f"{' + act_scales.npz' if args.quant == 'int8' else ''})")


if __name__ == "__main__":
    main()
