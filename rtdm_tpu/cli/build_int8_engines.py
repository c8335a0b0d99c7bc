"""Batch INT8 detector-engine builder — the build_int8_engines.sh
analogue (tensorrt_inference/yolo/build_int8_engines.sh).

The reference shell script symlinks `<model>-int8-<size>` names and loops
`onnx_to_tensorrt.py --int8` over a fixed model list. Here one invocation
builds calibrated int8 engines for every requested cfg in sequence,
naming each output dir `<stem>-int8-<img_size>`:

    python -m rtdm_tpu.cli.build_int8_engines \
        --cfgs cfg/yolov3-tiny-aider-416.cfg cfg/yolov4-tiny-aider-416.cfg \
        --weights-dir weights/ --calib-dir calib_images/ --output engines/

Weights resolve per cfg: `--weights-dir/<stem>.weights` (or .pt/.npz), or
random init with --allow-random for smoke builds.
"""

from __future__ import annotations

import argparse
import os
import time


def resolve_weights(weights_dir: str, stem: str):
    for ext in (".weights", ".pt", ".pth", ".npz"):
        p = os.path.join(weights_dir, stem + ext)
        if os.path.exists(p):
            return p
    return None


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Batch-build calibrated int8 detector engines")
    p.add_argument("--cfgs", nargs="+", required=True,
                   help="darknet .cfg / v5 .yaml files")
    p.add_argument("--weights-dir", help="directory holding "
                   "<cfg-stem>.{weights,pt,npz} per model")
    p.add_argument("--allow-random", action="store_true",
                   help="build with random init when weights are missing")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--calib-dir", required=True,
                   help="calibration image dir (calib_images/ analogue)")
    p.add_argument("--calib-method", default="entropy",
                   choices=["percentile", "entropy"])
    p.add_argument("--output", default="engines",
                   help="parent dir for the engine dirs")
    args = p.parse_args(argv)

    # make sure all needed files are present before building any engine
    # (the script's up-front existence check)
    missing = [c for c in args.cfgs if not os.path.exists(c)]
    if missing:
        raise SystemExit(f"ERROR: cannot find cfg file(s): {missing}")
    plans = []
    for cfg in args.cfgs:
        stem = os.path.splitext(os.path.basename(cfg))[0]
        w = resolve_weights(args.weights_dir, stem) \
            if args.weights_dir else None
        if w is None and not args.allow_random:
            raise SystemExit(
                f"ERROR: no weights for {stem} in {args.weights_dir!r} "
                f"(pass --allow-random for smoke builds)")
        plans.append((cfg, stem, w))

    from rtdm_tpu.cli.build_engine import load_detector_calib_images
    from rtdm_tpu.export.detector import (DetectorSpec, build_detector,
                                          save_detector)

    calib = load_detector_calib_images(args.calib_dir, args.img_size)
    print(f"calibration set: {calib.shape[0]} images "
          f"({args.calib_method})")
    built = []
    for cfg, stem, w in plans:
        name = f"{stem}-int8-{args.img_size}"
        print(f"\n=== {name} ===")
        spec = DetectorSpec(cfg_name=os.path.basename(cfg),
                            img_size=args.img_size, quant="int8",
                            calib_method=args.calib_method)
        t0 = time.time()
        det = build_detector(cfg, w, spec, batch_size=args.batch_size,
                             calib_images=calib)
        out = os.path.join(args.output, name)
        save_detector(det, out)
        print(f"built in {time.time() - t0:.1f}s -> {out} "
              f"(weights: {w or 'RANDOM INIT'})")
        built.append(out)
    print(f"\nDone. {len(built)} int8 engines under {args.output}")
    return built


if __name__ == "__main__":
    main()
