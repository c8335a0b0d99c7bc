"""Real-time classifier streaming CLI.

Parity with the reference's real-time-inference.py:23-221 (webcam/video
loop: preprocess -> infer -> class+FPS overlay; avg/min/max FPS report) —
minus its per-frame PIL round trip: here the host only resizes uint8
(cv2, SIMD) and ships ~59 KB/frame; /255 + ImageNet normalize + forward +
argmax all run inside one compiled device program. Frames can be
micro-batched (--batch) to amortize dispatch for offline sources.

Also reports energy/frame via the modelled PowerMonitor (the
calculate-power-usage.py analogue) with --power.

Run: python -m rtdm_tpu.cli.realtime_inference --source video.mp4 \
         --model squeeze-ernet --weights .../squeeze-ernet-state_dict.pt
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="Real-time AIDER classification")
    p.add_argument("--source", "--video", dest="source", required=True,
                   help="webcam id | /dev/videoN | rtsp:// | video file | "
                        "image dir (--video is the reference alias, "
                        "real-time-inference.py:34)")
    p.add_argument("--video-looping", action="store_true",
                   help="replay a finite source forever (reference "
                        "camera --video_looping)")
    p.add_argument("--width", type=int, default=0,
                   help="capture resize width (with --height; reference "
                        "--do_resize --width)")
    p.add_argument("--height", type=int, default=0,
                   help="capture resize height (with --width)")
    p.add_argument("--model", default="squeeze-ernet",
                   choices=["ernet", "squeeze-ernet", "squeeze-redconv"])
    p.add_argument("--weights")
    p.add_argument("--engine", help="serialized engine dir (TRT analogue)")
    p.add_argument("--quant", default="bf16",
                   choices=["fp32", "bf16", "fp16", "int8"])
    p.add_argument("--batch", type=int, default=1,
                   help="micro-batch frames before dispatch")
    p.add_argument("--max-frames", type=int, default=0,
                   help="stop after N frames (0 = run to end)")
    p.add_argument("--save-dir", help="write annotated frames here")
    p.add_argument("--power", action="store_true",
                   help="report modelled energy per frame")
    p.add_argument("--power-plot", help="write the power trace PNG here "
                   "(calculate-power-usage.py plot analogue)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard engine batches over all local devices "
                   "(mesh serving; no-op on a 1-chip host)")
    args = p.parse_args(argv)

    import numpy as np

    from rtdm_tpu.data.camera import FrameSource
    from rtdm_tpu.models.ernet import CLASS_NAMES
    from rtdm_tpu.utils.profiler import FpsMeter, PowerMonitor, StepTimer

    # --- build the compiled classifier ---
    # dispatch() enqueues a batch WITHOUT materializing; JAX dispatch is
    # async, so batch k+1 can be in flight while batch k's result is read
    # back — depth-2 double buffering that hides H2D/D2H behind compute
    # (replaces the reference's strictly serial hot loop,
    # real-time-inference.py:179-208).
    mesh = None
    if args.data_parallel:
        from rtdm_tpu.core.mesh import local_mesh, require_data_divisible
        mesh = local_mesh()
        if not args.engine:
            try:
                require_data_divisible(args.batch, mesh, "--batch")
            except ValueError as e:
                raise SystemExit(str(e))
    if args.engine:
        from rtdm_tpu.export.engine import Engine
        engine = Engine.load(args.engine, mesh=mesh)
        size = engine.spec.image_size

        def dispatch(u8_batch):
            return engine.dispatch(u8_batch)
    else:
        import jax
        import jax.numpy as jnp
        from rtdm_tpu.core.precision import policy_from_name
        from rtdm_tpu.data.aider import normalize_batch
        from rtdm_tpu.models import create_model
        from rtdm_tpu.models.io import load_variables

        model = create_model(args.model)
        size = model.image_size
        policy = policy_from_name(
            {"int8": "bf16"}.get(args.quant, args.quant))
        if not args.weights:
            p.error("--weights is required unless --engine is given")
        variables = load_variables(args.weights)
        from rtdm_tpu.models import with_checkpoint_head
        model = with_checkpoint_head(model, variables)
        cast = {"params": policy.cast_to_compute(variables["params"]),
                "batch_stats": variables.get("batch_stats", {})}

        jit_kwargs = {}
        if mesh is not None:
            from rtdm_tpu.core.mesh import data_sharding
            jit_kwargs = {"in_shardings": (None, data_sharding(mesh)),
                          "out_shardings": data_sharding(mesh)}

        def _fwd_impl(v, u8):
            x = normalize_batch(u8).astype(policy.compute_dtype)
            return model.apply(v, x, train=False)
        _fwd = jax.jit(_fwd_impl, **jit_kwargs)

        def dispatch(u8_batch):
            if u8_batch.shape[0] < args.batch:
                # tail micro-batch: ALWAYS pad to the full batch (mesh or
                # not) — a short tail is a new input shape and would
                # trigger a fresh jit compile (20-60s over the dev
                # tunnel); the consumer slices [:n]
                pad = np.zeros((args.batch - u8_batch.shape[0],)
                               + u8_batch.shape[1:], u8_batch.dtype)
                u8_batch = np.concatenate([u8_batch, pad])
            return _fwd(cast, jnp.asarray(u8_batch))

    def resize_frame(frame):
        import cv2
        return cv2.resize(frame, (size, size),
                          interpolation=cv2.INTER_LINEAR)

    src = FrameSource.open(
        int(args.source) if args.source.isdigit() else args.source,
        loop=args.video_looping, width=args.width,
        height=args.height).start()
    fps = FpsMeter()
    timer = StepTimer()
    power = PowerMonitor() if args.power else None
    if power:
        power.start()
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    import collections
    inst_fps = collections.deque(maxlen=100_000)  # bounded on live streams
    batch_frames, batch_raw = [], []
    n_out = 0
    in_flight = []  # [(device_probs, raw_frames, submit_time)] depth <= 2
    last_drain = [time.perf_counter()]

    def drain_one():
        nonlocal n_out
        dev, raws, t_submit = in_flight.pop(0)
        timer.start()
        probs = np.asarray(dev)[: len(raws)]  # blocks until ready
        timer.stop()
        if power:
            # device-busy estimate: dispatch->ready latency, capped at the
            # wall time since the previous drain (batches overlap)
            now = time.perf_counter()
            power.record_busy(min(now - t_submit, now - last_drain[0]))
            last_drain[0] = now
        # ONE tick per drained batch (FpsMeter.tick(n)): ticking per
        # frame inside this host loop measured microsecond gaps and
        # reported garbage avg/max FPS for --batch > 1
        cur = fps.tick(len(raws))
        inst_fps.append(cur)
        for i, raw in enumerate(raws):
            idx = int(np.argmax(probs[i]))
            conf = float(probs[i][idx])
            label = f"{CLASS_NAMES[idx]} {conf:.2f} | {cur:.1f} FPS"
            if args.save_dir:
                _annotate_and_save(raw, label,
                                   os.path.join(args.save_dir,
                                                f"frame_{n_out:05d}.jpg"))
            if n_out % 25 == 0:
                print(f"frame {n_out}: {label}")
            n_out += 1

    def submit():
        if not batch_frames:
            return
        in_flight.append((dispatch(np.stack(batch_frames)),
                          list(batch_raw), time.perf_counter()))
        batch_frames.clear()
        batch_raw.clear()
        if len(in_flight) > 1:  # keep exactly one batch hidden in flight
            drain_one()

    try:
        for frame in src:
            if args.max_frames:
                # count pending + in-flight + done so EXACTLY max_frames
                # are ingested — the tail drain would otherwise process
                # and save up to ~2 batches past the requested limit
                ingested = (n_out + sum(len(f[1]) for f in in_flight)
                            + len(batch_frames))
                if ingested >= args.max_frames:
                    break
            batch_frames.append(resize_frame(frame))
            batch_raw.append(frame)
            if len(batch_frames) >= args.batch:
                submit()
        submit()
        while in_flight:
            drain_one()
    except KeyboardInterrupt:  # graceful exit (real-time-inference.py:210)
        pass
    finally:
        src.stop()
        if power:
            power.stop()

    if inst_fps:
        seq = list(inst_fps)
        arr = np.array(seq[1:] if len(seq) > 1 else seq)
        print(f"frames {n_out}  FPS avg {arr.mean():.1f} "
              f"min {arr.min():.1f} max {arr.max():.1f}  "
              f"infer {timer.mean * 1e3:.2f} ms/batch")
        if power:
            print(f"energy/frame (modelled): "
                  f"{power.energy_per_frame(n_out):.3f} mJ, "
                  f"total {power.get_total_energy():.1f} J")
            if args.power_plot:
                print(f"power trace: {power.plot(args.power_plot)}")
    return n_out


def _annotate_and_save(frame, label: str, path: str) -> None:
    from PIL import Image, ImageDraw
    im = Image.fromarray(frame)
    d = ImageDraw.Draw(im)
    d.rectangle([0, 0, 8 + 7 * len(label), 18], fill=(0, 0, 0))
    d.text((4, 3), label, fill=(0, 255, 128))
    im.save(path)


if __name__ == "__main__":
    main()
