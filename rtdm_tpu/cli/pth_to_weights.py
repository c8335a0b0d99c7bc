"""Checkpoint <-> darknet .weights converter CLI.

Parity with yolov3/pth_to_weights.py:1-25 (convert() wrapper): takes our
.npz or a fork torch .pt and emits a darknet-format binary (and the
reverse), using the importers/exporters in models/darknet.py.

Run: python -m rtdm_tpu.cli.pth_to_weights --cfg x.cfg \
         --input best.npz --output best.weights
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="weights format converter")
    p.add_argument("--cfg", required=True, help="darknet .cfg")
    p.add_argument("--input", required=True, help=".npz | .pt | .weights")
    p.add_argument("--output", required=True, help=".weights | .npz")
    p.add_argument("--img-size", type=int, default=416)
    args = p.parse_args(argv)

    from rtdm_tpu.export.detector import load_detection_model
    from rtdm_tpu.models.darknet import save_darknet_weights
    from rtdm_tpu.models.io import save_variables

    model, variables, _ = load_detection_model(args.cfg, args.input,
                                               args.img_size)
    if args.output.endswith(".weights"):
        save_darknet_weights(variables, model.cfg_text, args.output)
    elif args.output.endswith(".npz"):
        save_variables(args.output, variables)
    else:
        raise SystemExit(f"unsupported output format: {args.output}")
    print(f"{args.input} -> {args.output}")


if __name__ == "__main__":
    main()
