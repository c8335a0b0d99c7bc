"""Headline benchmark: Squeeze_ErNET inference throughput per TPU chip.

Reference baseline: 3430.17 FPS — Squeeze ErNET under TensorRT fp16 on a
GTX 1660 Ti (code/disaster_detection/model/Readme.md:20; BASELINE.md).
The driver records `vs_baseline` = our FPS / 3430.17.

Methodology matches the reference's bracketing exactly
(evaluate-classification-metrics.py:70-79): inputs are moved to the device
*outside* the timed window (`data.to(device)` precedes the timer there), and
only the forward pass is timed, sync-bracketed. Here the whole normalize +
network forward is one jitted bf16 XLA program over uint8 NHWC frames
resident in HBM; the final output is materialised on host to force full
completion (block_until_ready alone is not trustworthy over the dev tunnel).
"""

from __future__ import annotations

import json
import sys as _sys
import time

import numpy as np


def _wait_for_device(max_wait_s: float = 1800.0,
                     probe_timeout_s: float = 120.0) -> bool:
    """Block until the JAX backend is reachable (bounded).

    The dev TPU sits behind a single-tenant tunnel that goes down for
    stretches; when it is down `jax.devices()` HANGS instead of raising,
    which would hang the whole bench run. Probe in a subprocess with a
    timeout and retry for up to RTDM_BENCH_WAIT_S seconds so a transient
    outage at bench time doesn't cost the measurement. Explicit-CPU runs
    (JAX_PLATFORMS=cpu, used by tests) skip the probe.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True
    max_wait_s = float(os.environ.get("RTDM_BENCH_WAIT_S", max_wait_s))
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, capture_output=True)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print(f"bench: device probe attempt {attempt} failed (tunnel "
              f"down?); retrying for up to "
              f"{int(deadline - time.monotonic())}s more", file=sys.stderr)
        time.sleep(60)


def main() -> None:
    if not _wait_for_device():
        raise SystemExit("bench: no JAX device became reachable within the "
                         "wait budget (TPU tunnel down) — refusing to "
                         "benchmark a fallback platform")
    best, weights_used = _classifier_bracket(
        "squeeze-ernet",
        "/root/reference/code/disaster_detection/weights/"
        "squeeze-ernet-state_dict.pt",
        # two batch points bracket the plateau (2048..8192 all land ~95k
        # FPS); the middle point only added ~500MB H2D over the dev tunnel
        batches=(2048, 8192))
    baseline = 3430.17  # TRT fp16 FPS on GTX 1660 Ti
    # MFU: 45.64 M MACs/frame @140^2 (model_summary/squeeze_ernet.txt) =
    # 91.28 MFLOPs, against the chip's bf16 peak.
    peak_flops = _chip_peak_bf16_flops()
    record = {
        "metric": "squeeze_ernet_bf16_fps_per_chip",
        "value": round(best["fps"], 2),
        "unit": "frames/s",
        "vs_baseline": round(best["fps"] / baseline, 3),
        "batch": best["batch"],
        "ms_per_batch": round(best["ms"], 3),
        "weights": weights_used,
        "mfu": round(best["fps"] * 45.64e6 * 2 / peak_flops, 4),
    }
    try:  # secondary headline: full detection pipeline (fwd+decode+NMS)
        det_fps = _detector_fps()
        if det_fps:
            record["yolov4_tiny_pipeline_fps"] = round(det_fps, 1)
            record["yolov4_tiny_vs_baseline"] = round(det_fps / 79.2, 2)
            # 6.77 GFLOPs/frame @416^2 (XLA cost analysis of the forward,
            # utils/summary.flops_of; decode+NMS add a negligible tail)
            record["yolov4_tiny_mfu"] = round(
                det_fps * 6.77e9 / peak_flops, 4)
    except Exception as e:
        # a missing metric must be visibly broken, not quietly absent
        print(f"bench: yolov4-tiny pipeline bracket failed ({e!r})",
              file=_sys.stderr)
    try:  # third headline: yolov5s full pipeline (ref: 70.49 FPS, 1660 Ti)
        v5_fps = _yolov5s_fps()
        if v5_fps:
            record["yolov5s_pipeline_fps"] = round(v5_fps, 1)
            record["yolov5s_vs_baseline"] = round(v5_fps / 70.49, 2)
            # 6.80 GFLOPs/frame @416^2 (XLA cost analysis, as above)
            record["yolov5s_mfu"] = round(v5_fps * 6.8e9 / peak_flops, 4)
    except Exception as e:
        print(f"bench: yolov5s pipeline bracket failed ({e!r})",
              file=_sys.stderr)
    # Remaining BASELINE.md FPS rows, so every headline number the
    # reference publishes has a measured counterpart in this JSON.
    try:  # RedConv classifier (ref TRT fp16: 3196.18 FPS, Readme.md:46)
        rc_fps = _redconv_fps()
        if rc_fps:
            record["redconv_bf16_fps"] = round(rc_fps, 1)
            record["redconv_vs_baseline"] = round(rc_fps / 3196.18, 2)
            # 38.89 M MACs/frame @140^2 (model_summary/squeeze_redconv.txt)
            record["redconv_mfu"] = round(
                rc_fps * 38.89e6 * 2 / peak_flops, 4)
    except Exception as e:
        print(f"bench: redconv bracket failed ({e!r})", file=_sys.stderr)
    try:  # YOLOv3 full pipeline (ref: 31.62 FPS, yolov3/Readme.md:24)
        v3_fps = _detector_fps(
            cfg_name="yolov3-aider-416.cfg", batch=64, iters=10)
        if v3_fps:
            record["yolov3_pipeline_fps"] = round(v3_fps, 1)
            record["yolov3_vs_baseline"] = round(v3_fps / 31.62, 2)
    except Exception as e:
        print(f"bench: yolov3 bracket failed ({e!r})", file=_sys.stderr)
    try:  # tiny YOLOv3 pipeline (ref: 94 FPS, yolov3/Readme.md:25)
        v3t_fps = _detector_fps(cfg_name="yolov3-tiny-aider-416.cfg")
        if v3t_fps:
            record["yolov3_tiny_pipeline_fps"] = round(v3t_fps, 1)
            record["yolov3_tiny_vs_baseline"] = round(v3t_fps / 94.0, 2)
    except Exception as e:
        print(f"bench: yolov3-tiny bracket failed ({e!r})", file=_sys.stderr)
    try:  # fourth headline: the fused two-stage cascade (one program:
        # detector fwd+decode+NMS AND classifier resize+normalize+fwd per
        # frame — the deployment config the reference runs as two engines
        # with host glue, trt_yolo.py + real-time-inference.py)
        cas_fps = _cascade_fps()
        if cas_fps:
            record["cascade_fps"] = round(cas_fps, 1)
    except Exception as e:
        print(f"bench: cascade bracket failed ({e!r})", file=_sys.stderr)
    print(json.dumps(record))


def _chip_peak_bf16_flops() -> float:
    """Best-effort bf16 peak for the attached chip (v5e default)."""
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    peaks = {"v4": 275e12, "v5 lite": 197e12, "v5e": 197e12,
             "v5p": 459e12, "v6": 918e12, "v6e": 918e12}
    for key, val in peaks.items():
        if key in kind:
            return val
    return 197e12


def _yolov5s_fps(batch: int = 128, iters: int = 20) -> float:
    """yolov5s 416 bf16 forward+decode+NMS on device (ref: 70.49 FPS,
    yolov5/README.md:25). Random init — identical compute graph to a
    trained model, so FPS is unaffected."""
    import os

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.export.detector import Detector, DetectorSpec, \
        load_detection_model

    yml = ("/root/reference/code/victim_localization/yolov5/models/"
           "yolov5s.yaml")
    if not os.path.exists(yml):
        return 0.0
    model, variables, heads = load_detection_model(yml, None, 416,
                                                   num_classes=2)
    det = Detector(model, variables,
                   DetectorSpec(cfg_name="yolov5s", img_size=416,
                                conf_thres=0.25, iou_thres=0.45,
                                quant="bf16"),
                   batch_size=batch, heads=heads)
    rng = np.random.default_rng(0)
    # frames live in HBM before the bracket (same methodology as the
    # classifier/v4-tiny brackets: H2D is excluded, forward-only is timed)
    dev = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 416, 416, 3), dtype=np.uint8)))
    d, c = det._fn(dev)  # compile + warm
    np.asarray(d)
    t0 = time.perf_counter()
    for _ in range(iters):
        d, c = det._fn(dev)
    np.asarray(d)
    return batch * iters / (time.perf_counter() - t0)


def _cascade_fps(batch: int = 256, iters: int = 20) -> float:
    """Fused two-stage cascade FPS (cli/cascade_stream.build_cascade):
    v4-tiny detector + Squeeze_ErNET scene classifier in ONE XLA program,
    one uint8 upload per frame batch."""
    import os

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.cli.cascade_stream import build_cascade

    cfg = ("/root/reference/code/victim_localization/yolov3/cfg/"
           "yolov4-tiny-aider-416.cfg")
    cls_w = ("/root/reference/code/disaster_detection/weights/"
             "squeeze-ernet-state_dict.pt")
    if not (os.path.exists(cfg) and os.path.exists(cls_w)):
        return 0.0
    fn = build_cascade(cfg, None, "squeeze-ernet", cls_w, 416,
                       conf=0.25, iou=0.45, batch=batch)
    rng = np.random.default_rng(0)
    dev = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 416, 416, 3), dtype=np.uint8)))
    probs, d, c = fn(dev)
    np.asarray(probs)
    t0 = time.perf_counter()
    for _ in range(iters):
        probs, d, c = fn(dev)
    np.asarray(probs)
    return batch * iters / (time.perf_counter() - t0)


def _classifier_bracket(model_name: str, weights_src: str,
                        batches=(2048,), iters: int = 50):
    """Shared classifier FPS bracket: reference weights when importable
    (logging which path ran — a benchmark must not silently change what
    it measures), weights closed over the jit like an Engine (the
    reference benches the TRT ENGINE, not a weights-as-arguments module;
    XLA constant-folds them, measured ~+1-2%), and double-buffered
    device-resident inputs so buffer reuse never serializes dispatch.
    Returns ({fps, batch, ms}, weights_used)."""
    import jax
    import jax.numpy as jnp

    from rtdm_tpu.core.precision import BF16_POLICY
    from rtdm_tpu.data.aider import normalize_batch
    from rtdm_tpu.models import create_model

    model = create_model(model_name)
    size = model.image_size
    try:
        from rtdm_tpu.models.torch_import import load_classifier_checkpoint
        variables = load_classifier_checkpoint(weights_src)
        weights_used = "reference-checkpoint"
    except Exception as e:
        print(f"bench: reference weights unavailable for {model_name} "
              f"({e!r}); falling back to random init", file=_sys.stderr)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, size, size, 3), jnp.float32))
        weights_used = "random-init"
    cast = {"params": BF16_POLICY.cast_to_compute(variables["params"]),
            "batch_stats": variables["batch_stats"]}

    @jax.jit
    def forward(images_u8):
        x = normalize_batch(images_u8).astype(BF16_POLICY.compute_dtype)
        return model.apply(cast, x, train=False)

    rng = np.random.default_rng(0)
    best = {"fps": 0.0, "batch": 0, "ms": 0.0}
    for batch in batches:
        bufs = [jax.device_put(jnp.asarray(
            rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)))
            for _ in range(2)]
        out = forward(bufs[0])
        np.asarray(out)  # compile + full warm-up round trip
        t0 = time.perf_counter()
        for i in range(iters):
            out = forward(bufs[i % 2])
        np.asarray(out)  # force completion of the whole chain
        dt = time.perf_counter() - t0
        fps = batch * iters / dt
        if fps > best["fps"]:
            best = {"fps": fps, "batch": batch, "ms": dt / iters * 1e3}
    return best, weights_used


def _redconv_fps(batch: int = 2048, iters: int = 50) -> float:
    """Squeeze_RedConv bf16 normalize+forward (ref TRT fp16: 3196.18 FPS,
    disaster_detection/model/Readme.md:46); the same double-buffered
    bracket as the ErNET headline."""
    best, _ = _classifier_bracket(
        "squeeze-redconv",
        "/root/reference/code/disaster_detection/weights/"
        "squeeze-redconv-state_dict.pt",
        batches=(batch,), iters=iters)
    return best["fps"]


def _detector_fps(batch: int = 256, iters: int = 20,
                  cfg_name: str = "yolov4-tiny-aider-416.cfg") -> float:
    """Darknet-cfg 416 bf16 forward+decode+NMS on device (defaults to the
    v4-tiny headline, ref: 79.2 FPS)."""
    import os

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.export.detector import load_detection_model
    from rtdm_tpu.ops.nms import batched_nms
    from rtdm_tpu.ops.yolo import decode_all

    cfg = ("/root/reference/code/victim_localization/yolov3/cfg/"
           + cfg_name)
    if not os.path.exists(cfg):
        return 0.0
    model, variables, heads = load_detection_model(cfg, None, 416)
    cast = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, variables["params"])
    vars_c = {"params": cast, "batch_stats": variables["batch_stats"]}

    @jax.jit
    def full(u8):
        raw = model.apply(vars_c, u8.astype(jnp.bfloat16) / 255.0,
                          train=False)
        return batched_nms(decode_all(raw, heads, 416), 0.25, 0.45, 100, 256)

    rng = np.random.default_rng(0)
    dev = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 416, 416, 3), dtype=np.uint8)))
    d, c = full(dev)
    np.asarray(d)
    t0 = time.perf_counter()
    for _ in range(iters):
        d, c = full(dev)
    np.asarray(d)
    return batch * iters / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
