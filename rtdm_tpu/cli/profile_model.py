"""Per-layer model profiler CLI.

Mirrors the reference's `python models/yolo.py --cfg ... --profile`
entry (yolov5/models/yolo.py:286-299 builds the model and calls
forward_once(profile=True) -> per-layer time/GFLOPs/params table).
Here each layer's cost is the XLA prefix-program delta (see
rtdm_tpu/utils/layer_profile.py for why that is the honest TPU number).

Usage:
    python -m rtdm_tpu.cli.profile_model --cfg yolov5s.yaml \
        [--img-size 416] [--batch 1] [--weights ckpt] [--iters 10]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True, help="yolov5 .yaml")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--weights", help="optional torch .pt checkpoint")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--iters", type=int, default=10,
                   help="timing repeats per prefix (best-of)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.models.yolov5 import (create_yolov5,
                                        load_yolov5_torch_checkpoint)
    from rtdm_tpu.utils.layer_profile import (format_profile_table,
                                              profile_v5_layers)

    model = create_yolov5(args.cfg, num_classes=args.num_classes)
    x = jnp.zeros((args.batch, args.img_size, args.img_size, 3),
                  jnp.float32)
    variables = model.init(jax.random.key(0), x)
    if args.weights:
        variables = load_yolov5_torch_checkpoint(variables, args.weights)

    rows = profile_v5_layers(model, variables, x, iters=args.iters)
    print(format_profile_table(rows))
    return rows


if __name__ == "__main__":
    main()
