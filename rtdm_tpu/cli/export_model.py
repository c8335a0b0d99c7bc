"""Model export CLI — the generate_onnx.py analogue.

Exports a classifier or detector forward as a serialized StableHLO module
(.stablehlo), with optional dynamic batch axis and post-export verification
(generate_onnx.py:31-47 surface).

Run: python -m rtdm_tpu.cli.export_model --model squeeze-ernet \
         --weights ... --output squeeze-ernet.stablehlo [--dynamic-batch]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Export model to StableHLO")
    p.add_argument("--model", help="classifier name (ernet family)")
    p.add_argument("--cfg", help="detector .cfg/.yaml instead of --model")
    p.add_argument("--weights", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--dynamic-batch", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from rtdm_tpu.export.serialize import (export_stablehlo, save_exported,
                                           verify_export)

    if args.cfg:
        from rtdm_tpu.export.detector import load_detection_model
        from rtdm_tpu.ops.yolo import decode_all

        size = args.img_size or 416
        model, variables, heads = load_detection_model(args.cfg,
                                                       args.weights, size)

        def fwd(u8):
            raw = model.apply(variables, u8.astype(jnp.float32) / 255.0,
                              train=False)
            return decode_all(raw, heads, size)
    else:
        from rtdm_tpu.data.aider import normalize_batch
        from rtdm_tpu.models import create_model
        from rtdm_tpu.models.io import load_variables

        model = create_model(args.model or "squeeze-ernet")
        size = args.img_size or model.image_size
        variables = load_variables(args.weights)
        from rtdm_tpu.models import with_checkpoint_head
        model = with_checkpoint_head(model, variables)

        def fwd(u8):
            return model.apply(variables, normalize_batch(u8), train=False)

    example = np.zeros((args.batch_size, size, size, 3), np.uint8)
    blob = export_stablehlo(fwd, [example], dynamic_batch=args.dynamic_batch)
    verify_export(blob, [example], reference_fn=fwd)
    out = save_exported(args.output, blob)
    print(f"exported + verified: {out} ({len(blob) / 1e6:.2f} MB, "
          f"dynamic_batch={args.dynamic_batch})")
    return out


if __name__ == "__main__":
    main()
