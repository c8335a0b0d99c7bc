"""Two-stage disaster-management cascade, fused on-device.

The reference's deployment story (README.md:1-16) is classifier + detector
as two separate engines with host glue (trt_yolo.py camera loop). Here the
WHOLE cascade is one compiled XLA program per frame batch:

    uint8 letterboxed frame -> [ detector: /255 -> darknet/v5 -> decode
                                 -> NMS ]  and, from the same device
    buffer -> [ classifier: resize 140 -> ImageNet normalize -> ErNET ]

so a frame is uploaded once and the host gets back (scene_probs, boxes,
count). This is the trt_yolo.py analogue plus the cascade config from
BASELINE.json.

Run: python -m rtdm_tpu.cli.cascade_stream --source <dir|video> \
         --det-cfg .../yolov4-tiny-aider-416.cfg --det-weights ... \
         --cls-model squeeze-ernet --cls-weights ...
"""

from __future__ import annotations

import argparse
import os
import time


def build_cascade(det_cfg: str, det_weights, cls_model_name: str,
                  cls_weights, img_size: int, conf: float, iou: float,
                  quant: str = "bf16", batch: int = 1):
    import jax
    import jax.numpy as jnp

    from rtdm_tpu.core.precision import policy_from_name
    from rtdm_tpu.data.aider import IMAGENET_MEAN, IMAGENET_STD
    from rtdm_tpu.export.detector import load_detection_model
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.io import load_variables
    from rtdm_tpu.ops.nms import batched_nms
    from rtdm_tpu.ops.yolo import decode_all

    policy = policy_from_name({"int8": "bf16", "fp16": "bf16"}.get(quant,
                                                                   quant))
    dtype = policy.compute_dtype

    det_model, det_vars, heads = load_detection_model(det_cfg, det_weights,
                                                      img_size)
    det_vars = {"params": policy.cast_to_compute(det_vars["params"]),
                "batch_stats": det_vars.get("batch_stats", {})}

    cls_model = create_model(cls_model_name)
    cls_size = cls_model.image_size
    cls_vars = load_variables(cls_weights)
    cls_vars = {"params": policy.cast_to_compute(cls_vars["params"]),
                "batch_stats": cls_vars.get("batch_stats", {})}

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def cascade(u8):
        xf = u8.astype(jnp.float32)
        # detector branch
        raw = det_model.apply(det_vars, (xf / 255.0).astype(dtype),
                              train=False)
        pred = decode_all(raw, heads, img_size)
        det, count = batched_nms(pred, conf, iou, 100, 256)
        # classifier branch: device-side resize + ImageNet normalize
        small = jax.image.resize(
            xf, (xf.shape[0], cls_size, cls_size, 3), method="bilinear")
        cls_in = ((small / 255.0 - mean) / std).astype(dtype)
        probs = cls_model.apply(cls_vars, cls_in, train=False)
        return probs.astype(jnp.float32), det, count

    fn = (jax.jit(cascade)
          .lower(jax.ShapeDtypeStruct((batch, img_size, img_size, 3),
                                      jnp.uint8))
          .compile())
    return fn


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Fused classifier+detector stream on TPU")
    p.add_argument("--source", required=True)
    p.add_argument("--video-looping", action="store_true",
                   help="replay a finite source forever (reference camera "
                        "--video_looping)")
    p.add_argument("--width", type=int, default=0,
                   help="capture resize width (reference --do_resize)")
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--det-cfg", required=True,
                   help="darknet .cfg or v5 .yaml")
    p.add_argument("--det-weights")
    p.add_argument("--cls-model", default="squeeze-ernet")
    p.add_argument("--cls-weights", required=True)
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--conf-thres", type=float, default=0.3)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--quant", default="bf16",
                   choices=["fp32", "bf16", "fp16"])
    p.add_argument("--names", help=".names file")
    p.add_argument("--save-dir")
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args(argv)

    import numpy as np
    import jax.numpy as jnp

    from rtdm_tpu.cli.yolo_detect import draw_detections
    from rtdm_tpu.data.camera import FrameSource
    from rtdm_tpu.data.odder import letterbox_image, load_names
    from rtdm_tpu.models.ernet import CLASS_NAMES
    from rtdm_tpu.ops.nms import scale_coords
    from rtdm_tpu.utils.profiler import FpsMeter, StepTimer

    names = load_names(args.names) if args.names else ["person", "vehicle"]
    fn = build_cascade(args.det_cfg, args.det_weights, args.cls_model,
                       args.cls_weights, args.img_size, args.conf_thres,
                       args.iou_thres, args.quant)

    src = FrameSource.open(
        int(args.source) if args.source.isdigit() else args.source,
        loop=args.video_looping,
        width=args.width, height=args.height).start()
    fps = FpsMeter()
    timer = StepTimer()
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
    n = 0
    # unbounded sources (webcam/rtsp, looping video, --max-frames 0) must
    # not accumulate per-frame state — same leak guard as yolo_detect
    src_is_live = args.source.isdigit() or str(args.source).startswith(
        ("rtsp://", "http://", "https://")) or str(
        args.source).endswith(".streams")
    bounded = args.max_frames > 0 or not (src_is_live or args.video_looping)
    results = []
    for frame in src:
        boxed, _, _ = letterbox_image(frame, args.img_size)
        timer.start()
        probs, det, count = fn(jnp.asarray(boxed[None]))
        probs = np.asarray(probs)[0]
        det = np.asarray(det)
        timer.stop(det)
        k = int(np.asarray(count)[0])
        det_scaled = np.asarray(scale_coords(
            jnp.asarray(det), (args.img_size, args.img_size),
            tuple(frame.shape[:2])))[0][:k]
        scene = CLASS_NAMES[int(np.argmax(probs))]
        cur = fps.tick()
        if bounded:
            results.append((scene, det_scaled))
        if args.save_dir:
            from PIL import Image, ImageDraw
            annotated = draw_detections(frame, det_scaled, names)
            im = Image.fromarray(annotated)
            d = ImageDraw.Draw(im)
            d.text((4, 4), f"{scene} | {cur:.1f} FPS", fill=(255, 255, 0))
            im.save(os.path.join(args.save_dir, f"frame_{n:05d}.jpg"))
        if n % 10 == 0:
            print(f"frame {n}: scene={scene} victims/vehicles={k} "
                  f"({timer.times[-1] * 1e3:.1f} ms)")
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    src.stop()
    print(f"frames {n}  cascade {timer.mean * 1e3:.2f} ms/frame "
          f"({1 / max(timer.mean, 1e-9):.1f} FPS)")
    return results


if __name__ == "__main__":
    main()
