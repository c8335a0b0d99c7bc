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

Coverage: every FPS row the reference publishes (BASELINE.md) has a
measured counterpart here, each with {fps, vs_baseline, mfu, and an HBM
ledger — bytes/frame, GB/s, util-of-nameplate — read from the compiled
executable's own cost analysis}, plus the sealed int8 classifier engine,
ErNET, the fused two-stage cascade, a modelled energy-per-frame table
mirroring model/Readme.md:25-29/:51-55 (the TX2 INA3221 rows — this TPU
exposes no power telemetry, so energy is the documented busy-time model:
chip watts / measured FPS), and a batch-1/8/32 LATENCY table for the
classifier engine, the v4-tiny pipeline, and the cascade (the reference's
deployment surface is a per-frame loop with FPS readout,
real-time-inference.py:179-208 / trt_yolo.py:130-162 — ms/frame at small
batch is the product; large-batch throughput is the proxy).
"""

from __future__ import annotations

import json
import sys as _sys
import time

import numpy as np

_WEIGHTS = "/root/reference/code/disaster_detection/weights/"
_CFGS = "/root/reference/code/victim_localization/yolov3/cfg/"
_HBM_PEAK = 819e9  # v5e HBM nameplate bytes/s


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
    best, weights_used, se_flops, se_bytes = _classifier_bracket(
        "squeeze-ernet", _WEIGHTS + "squeeze-ernet-state_dict.pt",
        # two batch points bracket the plateau (2048..8192 all land ~95k
        # FPS); the middle point only added ~500MB H2D over the dev tunnel
        batches=(2048, 8192))
    baseline = 3430.17  # TRT fp16 FPS on GTX 1660 Ti
    peak_flops = _chip_peak_bf16_flops()
    # analytic fallback: 45.64 M MACs/frame @140^2 ·2
    # (model_summary/squeeze_ernet.txt) when cost analysis is unavailable
    se_flops = se_flops or 45.64e6 * 2
    record = {
        "metric": "squeeze_ernet_bf16_fps_per_chip",
        "value": round(best["fps"], 2),
        "unit": "frames/s",
        "vs_baseline": round(best["fps"] / baseline, 3),
        "batch": best["batch"],
        "ms_per_batch": round(best["ms"], 3),
        "weights": weights_used,
        "mfu": round(best["fps"] * se_flops / peak_flops, 4),
    }
    _hbm_rows(record, "", best["fps"], se_bytes)

    def row(prefix, fn, baseline_fps, fallback_flops, note=None, **kw):
        """One BASELINE row: {fps, vs_baseline, mfu, hbm ledger} or a
        visible failure — a missing metric must be broken loudly, never
        quietly absent. `fn` returns (fps, flops_per_frame|None,
        bytes_per_frame|None) — the flops/bytes come from the compiled
        executable's own cost analysis (VERDICT r4 #1: every benched
        program carries its roofline numerator, not just the headline)."""
        t0 = time.perf_counter()
        print(f"bench: {prefix} bracket...", file=_sys.stderr, flush=True)
        try:
            fps, flops_pf, bytes_pf = fn()
        except Exception as e:
            print(f"bench: {prefix} bracket failed ({e!r})",
                  file=_sys.stderr)
            return
        if not fps:
            print(f"bench: {prefix} bracket skipped (missing reference "
                  "artifact)", file=_sys.stderr)
            return
        print(f"bench: {prefix} -> {fps:.1f} FPS "
              f"({time.perf_counter() - t0:.0f}s)",
              file=_sys.stderr, flush=True)
        record[f"{prefix}_fps"] = round(fps, 1)
        if baseline_fps:
            record[f"{prefix}_vs_baseline"] = round(fps / baseline_fps, 2)
        record[f"{prefix}_mfu"] = round(
            fps * (flops_pf or fallback_flops) / peak_flops, 4)
        _hbm_rows(record, f"{prefix}_", fps, bytes_pf)
        if note:
            record[f"{prefix}_note"] = note
        record.update(kw)

    # detection pipelines (fwd + decode + NMS, one XLA program each)
    row("yolov4_tiny_pipeline", lambda: _detector_fps(
        cfg_name="yolov4-tiny-aider-416.cfg"), 79.2, 6.77e9)
    row("yolov5s_pipeline", _yolov5s_fps, 70.49, 6.8e9)
    # batch 128 is yolov3's measured knee: 1986 vs 1684 FPS at b64
    # (+18%, runs/batch_probe_r5.txt); b256's compile ran past the probe
    # budget on the remote compiler and was not pursued (CLAUDE.md: a
    # killed client does NOT abort a server-side compile)
    row("yolov3_pipeline", lambda: _detector_fps(
        cfg_name="yolov3-aider-416.cfg", batch=128), 31.62, 65.4e9)
    row("yolov3_tiny_pipeline", lambda: _detector_fps(
        cfg_name="yolov3-tiny-aider-416.cfg"), 94.0, 5.5e9)
    # classifiers beyond the headline
    row("redconv_bf16", _redconv_fps, 3196.18, 38.89e6 * 2)
    if "redconv_bf16_fps" in record:  # which weights actually ran —
        # the bench must not silently change what it measures
        record["redconv_weights"] = getattr(_redconv_fps, "weights_used",
                                            "unknown")
    # reference publishes no ErNET FPS row (model/Readme.md covers only the
    # Squeeze variants) — MACs anchor 159.93 M @240^2, so no vs_baseline
    row("ernet_bf16", _ernet_fps, None, 159.93e6 * 2,
        note="no reference FPS row for ErNET (BASELINE.md anchors "
             "params/MACs only)")
    if "ernet_bf16_fps" in record:
        record["ernet_weights"] = getattr(_ernet_fps, "weights_used",
                                          "unknown")
    # sealed int8 classifier engine (TRT int8 analogue). QDQ on bf16 by
    # measured design choice: true-int8 convs lose 12x at these K sizes
    # (docs/DESIGN.md), so int8 is an ACCURACY simulation, not an
    # optimization (~0.99x bf16 at b2048 — the QDQ elementwise fuses).
    row("squeeze_ernet_int8_engine", _int8_engine_fps, baseline,
        45.64e6 * 2,
        note="QDQ-on-bf16 accuracy simulation, not a speed path (true-"
             "int8 convs measured 12x slower at ErNET sizes; QDQ cost "
             "~vanishes at large batch — measured ~0.99x bf16 at b2048)")
    # fused two-stage cascade: detector fwd+decode+NMS AND classifier
    # resize+normalize+fwd per frame in ONE program (the deployment config
    # the reference runs as two engines with host glue, trt_yolo.py +
    # real-time-inference.py). Reference ceiling = its detector-bound
    # stage: tiny-YOLOv4 at 79.2 FPS (yolov3/Readme.md:26) — the
    # classifier stage (3430 FPS) adds <3% to the two-engine frame time.
    row("cascade", _cascade_fps, 79.2, 6.77e9 + 45.64e6 * 2)

    # ---- batch-1/8/32 latency table (VERDICT r4 #2) ----
    try:
        record["latency_ms"] = _latency_table()
    except Exception as e:
        print(f"bench: latency table failed ({e!r})", file=_sys.stderr)

    # ---- modelled energy/frame (model/Readme.md:25-29/:51-55 analogue).
    # No TPU power telemetry exists on this host; the model is the
    # documented busy-time one (utils/profiler.PowerMonitor): chip watts
    # while a dispatch is in flight. At bench steady-state the device is
    # saturated, so mJ/frame = watts / FPS. Labelled modelled, never mixed
    # with measured FPS rows.
    watts = _chip_watts()
    energy = {"modelled": True, "chip_watts": watts,
              "model": "busy-time (no INA3221 analogue on TPU); "
                       "mJ/frame = chip_watts / measured_fps"}
    for key, ref_mj, ref_row in (
            ("squeeze_ernet_bf16", 1.857, "trt16 TX2 Readme.md:29"),
            ("squeeze_ernet_int8", 1.857, "trt16 TX2 Readme.md:29"),
            ("redconv_bf16", 1.472, "trt16 TX2 Readme.md:55"),
            ("ernet_bf16", None, "no reference energy row"),
            ("yolov4_tiny", None, "no reference energy row"),
            ("cascade", None, "no reference energy row")):
        fps_key = {"squeeze_ernet_bf16": "value",
                   "squeeze_ernet_int8": "squeeze_ernet_int8_engine_fps",
                   "redconv_bf16": "redconv_bf16_fps",
                   "ernet_bf16": "ernet_bf16_fps",
                   "yolov4_tiny": "yolov4_tiny_pipeline_fps",
                   "cascade": "cascade_fps"}[key]
        fps = record.get(fps_key)
        if not fps:
            continue
        mj = watts / fps * 1e3
        entry = {"mj_per_frame": round(mj, 4), "ref": ref_row}
        if ref_mj:
            entry["ref_mj_per_frame"] = ref_mj
            entry["vs_ref"] = round(mj / ref_mj, 3)
        energy[key] = entry
    record["energy_modelled"] = energy
    print(json.dumps(record))


def _hbm_rows(record: dict, prefix: str, fps: float, bytes_pf) -> None:
    """The measured roofline leg for one program: bytes the compiled
    executable actually moves per frame, the implied GB/s at the measured
    FPS, and the fraction of the v5e's 819 GB/s HBM nameplate. Emitted for
    EVERY benched program (VERDICT r4 #1) so each row carries its own
    close-or-bury evidence alongside MFU."""
    if not bytes_pf:
        return
    record[f"{prefix}hbm_bytes_per_frame"] = round(bytes_pf)
    record[f"{prefix}hbm_gbps"] = round(fps * bytes_pf / 1e9, 1)
    record[f"{prefix}hbm_util_of_819gbps"] = round(
        fps * bytes_pf / _HBM_PEAK, 4)


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


def _chip_watts() -> float:
    from rtdm_tpu.utils.profiler import DEFAULT_CHIP_WATTS
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    return next((w for k, w in DEFAULT_CHIP_WATTS.items()
                 if k.split("-")[-1] in kind),
                DEFAULT_CHIP_WATTS["tpu-v5e"])


def _cost_per_example(compiled, batch, key):
    """Per-frame figure from the compiled program's own cost analysis —
    the roofline numerators are then exactly what was measured, not an
    analytic stand-in. None when the backend can't report."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        f = float(cost.get(key, 0.0))
        return f / batch if f > 0 else None
    except Exception:
        return None


def _flops_per_example(compiled, batch):
    return _cost_per_example(compiled, batch, "flops")


def _bytes_per_example(compiled, batch):
    """'bytes accessed' — what the compiled executable actually reads +
    writes in HBM, the roofline numerator DESIGN.md's hand bounds
    approximate."""
    return _cost_per_example(compiled, batch, "bytes accessed")


def _timed_fps(compiled, dev_args, batch: int, iters: int) -> float:
    """Sync-bracketed steady-state FPS of a pre-compiled program over
    device-resident inputs (H2D excluded, like the reference's bracket).
    dev_args: list of per-iteration argument tuples (double buffering)."""
    import jax

    out = compiled(*dev_args[0])  # warm round trip
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = compiled(*dev_args[i % len(dev_args)])
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return batch * iters / (time.perf_counter() - t0)


def _yolov5s_fps(batch: int = 128, iters: int = 20):
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
        return 0.0, None, None
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
    compiled = det._fn  # already a compiled XLA executable (Detector)
    fps = _timed_fps(compiled, [(dev,)], batch, iters)
    return (fps, _flops_per_example(compiled, batch),
            _bytes_per_example(compiled, batch))


def _cascade_fps(batch: int = 256, iters: int = 20):
    """Fused two-stage cascade FPS (cli/cascade_stream.build_cascade):
    v4-tiny detector + Squeeze_ErNET scene classifier in ONE XLA program,
    one uint8 upload per frame batch."""
    import os

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.cli.cascade_stream import build_cascade

    cfg = _CFGS + "yolov4-tiny-aider-416.cfg"
    cls_w = _WEIGHTS + "squeeze-ernet-state_dict.pt"
    if not (os.path.exists(cfg) and os.path.exists(cls_w)):
        return 0.0, None, None
    fn = build_cascade(cfg, None, "squeeze-ernet", cls_w, 416,
                       conf=0.25, iou=0.45, batch=batch)
    rng = np.random.default_rng(0)
    dev = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 416, 416, 3), dtype=np.uint8)))
    # build_cascade already returns a compiled XLA executable
    fps = _timed_fps(fn, [(dev,)], batch, iters)
    return (fps, _flops_per_example(fn, batch),
            _bytes_per_example(fn, batch))


def _classifier_bracket(model_name: str, weights_src: str,
                        batches=(2048,), iters: int = 50):
    """Shared classifier FPS bracket: reference weights when importable
    (logging which path ran — a benchmark must not silently change what
    it measures), weights closed over the jit like an Engine (the
    reference benches the TRT ENGINE, not a weights-as-arguments module;
    XLA constant-folds them, measured ~+1-2%), and double-buffered
    device-resident inputs so buffer reuse never serializes dispatch.
    Returns ({fps, batch, ms}, weights_used, flops_per_frame|None,
    bytes_per_frame|None)."""
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

    def forward(images_u8):
        x = normalize_batch(images_u8).astype(BF16_POLICY.compute_dtype)
        return model.apply(cast, x, train=False)

    rng = np.random.default_rng(0)
    best = {"fps": 0.0, "batch": 0, "ms": 0.0}
    flops_pf = None
    bytes_pf = None
    for batch in batches:
        print(f"bench: {model_name} b{batch} upload+compile...",
              file=_sys.stderr, flush=True)
        bufs = [jax.device_put(jnp.asarray(
            rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)))
            for _ in range(2)]
        compiled = jax.jit(forward).lower(bufs[0]).compile()
        flops_pf = flops_pf or _flops_per_example(compiled, batch)
        bytes_pf = _bytes_per_example(compiled, batch) or bytes_pf
        fps = _timed_fps(compiled, [(b,) for b in bufs], batch, iters)
        if fps > best["fps"]:
            best = {"fps": fps, "batch": batch,
                    "ms": batch / fps * 1e3}
    return best, weights_used, flops_pf, bytes_pf


def _redconv_fps(batch: int = 2048, iters: int = 50):
    """Squeeze_RedConv bf16 normalize+forward (ref TRT fp16: 3196.18 FPS,
    disaster_detection/model/Readme.md:46); the same double-buffered
    bracket as the ErNET headline. Records which weights ran via the
    module-level side channel read by main()."""
    best, weights_used, flops_pf, bytes_pf = _classifier_bracket(
        "squeeze-redconv", _WEIGHTS + "squeeze-redconv-state_dict.pt",
        batches=(batch,), iters=iters)
    _redconv_fps.weights_used = weights_used
    return best["fps"], flops_pf, bytes_pf


def _ernet_fps(batch: int = 2048, iters: int = 30):
    """ErNET (the EmergencyNet baseline, 276,118 params @240^2) bf16
    normalize+forward; completes the classifier family coverage."""
    best, weights_used, flops_pf, bytes_pf = _classifier_bracket(
        "ernet", _WEIGHTS + "ernet-state_dict.pt",
        batches=(batch,), iters=iters)
    _ernet_fps.weights_used = weights_used
    return best["fps"], flops_pf, bytes_pf


def _int8_engine_fps(batch: int = 2048, iters: int = 50):
    """Sealed int8 classifier engine FPS: the calibrated scales come from
    the committed artifact (artifacts/engines/squeeze-ernet_int8 —
    entropy-calibrated, cli/build_engine.py), rebuilt at the bench batch
    (the sealed executable is batch-256; calibration is batch-agnostic)."""
    import os

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.export.engine import Engine, EngineSpec
    from rtdm_tpu.models.io import load_variables

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "engines", "squeeze-ernet_int8")
    if not os.path.isdir(art):
        return 0.0, None, None
    variables = load_variables(os.path.join(art, "params.npz"))
    act_scales = dict(np.load(os.path.join(art, "act_scales.npz")))
    with open(os.path.join(art, "spec.json")) as f:
        spec_d = json.load(f)
    spec_d["batch_size"] = batch
    eng = Engine(EngineSpec(**spec_d), variables, act_scales=act_scales)
    size = eng.spec.image_size
    rng = np.random.default_rng(0)
    bufs = [jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)))
        for _ in range(2)]
    fps = _timed_fps(eng._compiled, [(b,) for b in bufs], batch, iters)
    return (fps, _flops_per_example(eng._compiled, batch),
            _bytes_per_example(eng._compiled, batch))


def _detector_fps(batch: int = 256, iters: int = 20,
                  cfg_name: str = "yolov4-tiny-aider-416.cfg"):
    """Darknet-cfg 416 bf16 forward+decode+NMS on device (defaults to the
    v4-tiny headline, ref: 79.2 FPS)."""
    compiled = _build_detector_program(cfg_name, batch)
    if compiled is None:
        return 0.0, None, None
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    dev = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 416, 416, 3), dtype=np.uint8)))
    fps = _timed_fps(compiled, [(dev,)], batch, iters)
    return (fps, _flops_per_example(compiled, batch),
            _bytes_per_example(compiled, batch))


def _build_detector_program(cfg_name: str, batch: int):
    """Compile the full detection pipeline (normalize+fwd+decode+NMS) for
    one darknet cfg at one batch size; shared by the FPS and latency
    brackets so both measure the same executable shape."""
    import os

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.export.detector import load_detection_model
    from rtdm_tpu.ops.nms import batched_nms
    from rtdm_tpu.ops.yolo import decode_all

    cfg = _CFGS + cfg_name
    if not os.path.exists(cfg):
        return None
    model, variables, heads = load_detection_model(cfg, None, 416)
    cast = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, variables["params"])
    vars_c = {"params": cast, "batch_stats": variables["batch_stats"]}

    def full(u8):
        raw = model.apply(vars_c, u8.astype(jnp.bfloat16) / 255.0,
                          train=False)
        return batched_nms(decode_all(raw, heads, 416), 0.25, 0.45, 100, 256)

    return (jax.jit(full)
            .lower(jax.ShapeDtypeStruct((batch, 416, 416, 3), jnp.uint8))
            .compile())


# ---------------------------------------------------------------------------
# Latency table (VERDICT r4 #2): ms/frame at batch 1/8/32, device-time and
# end-to-end, for the deployment programs.
# ---------------------------------------------------------------------------

def _lat_sync_ms(compiled, dev_args, iters: int = 30) -> float:
    """Median per-call wall time with inputs already in HBM and the output
    materialized every call — what a per-frame real-time loop on this host
    observes (includes one tunnel round trip, exactly as the reference's
    per-frame FPS readouts include PCIe + python overhead,
    real-time-inference.py:194-198 / trt_yolo.py:118-121)."""
    import jax

    def once():
        out = compiled(*dev_args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    once()  # warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        once()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def _lat_pipelined_ms(compiled, dev_args, iters: int = 50) -> float:
    """Amortized per-call time with `iters` dispatches in flight and ONE
    materialization at the end — the device-side program time once
    dispatch overhead overlaps (the double-buffered deployment mode,
    export/engine.py dispatch)."""
    import jax

    out = compiled(*dev_args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*dev_args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _lat_e2e_ms(compiled, host_batch: np.ndarray, iters: int = 30) -> float:
    """Median per-call wall time INCLUDING the H2D upload of the uint8
    frame batch — the do_inference_v2 bracket (memcpy_htod + execute +
    memcpy_dtoh, yolo_with_plugins.py:247-263)."""
    import jax
    import jax.numpy as jnp

    def once():
        dev = jax.device_put(jnp.asarray(host_batch))
        out = compiled(dev)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    once()  # warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        once()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def _tunnel_rtt_ms(iters: int = 30) -> float:
    """Dispatch+sync cost of a trivial compiled program (one scalar add):
    the per-call relay/tunnel floor to subtract when reading the sync
    latencies as device time."""
    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.zeros((1,), jnp.float32))
    f = jax.jit(lambda v: v + 1).lower(x).compile()
    return _lat_sync_ms(f, (x,), iters)


def _latency_table() -> dict:
    """ms/frame at batch 1, 8, 32 for the classifier engine, the v4-tiny
    detector pipeline, and the fused cascade. Three brackets per cell:
    sync (per-call, output materialized — real per-frame latency on this
    host incl. one tunnel RTT), pipelined (dispatches overlapped — the
    device program time), e2e (H2D upload included). `tunnel_rtt_ms` is
    the trivial-program floor so readers can separate the relay honestly:
    device-side latency ≈ sync − rtt."""
    import os

    import jax
    import jax.numpy as jnp

    from rtdm_tpu.cli.cascade_stream import build_cascade
    from rtdm_tpu.core.precision import BF16_POLICY
    from rtdm_tpu.data.aider import normalize_batch
    from rtdm_tpu.models import create_model

    out = {"batches": [1, 8, 32],
           "tunnel_rtt_ms": round(_tunnel_rtt_ms(), 2)}
    rng = np.random.default_rng(0)

    def bracket(name, make_compiled, shape_of):
        rows = {}
        for b in out["batches"]:
            print(f"bench: latency {name} b{b} compile...",
                  file=_sys.stderr, flush=True)
            try:
                compiled = make_compiled(b)
            except Exception as e:
                print(f"bench: latency {name} b{b} failed ({e!r})",
                      file=_sys.stderr)
                continue
            if compiled is None:
                continue
            host = rng.integers(0, 255, shape_of(b), dtype=np.uint8)
            dev = jax.device_put(jnp.asarray(host))
            sync = _lat_sync_ms(compiled, (dev,))
            pipe = _lat_pipelined_ms(compiled, (dev,))
            e2e = _lat_e2e_ms(compiled, host)
            rows[f"b{b}"] = {
                "sync_ms": round(sync, 2),
                "sync_ms_per_frame": round(sync / b, 3),
                "pipelined_ms": round(pipe, 2),
                "pipelined_ms_per_frame": round(pipe / b, 3),
                "e2e_ms": round(e2e, 2),
                "e2e_ms_per_frame": round(e2e / b, 3),
            }
        if rows:
            out[name] = rows

    # classifier: the same bf16 normalize+forward program as the headline
    # bracket, compiled at the small batch
    model = create_model("squeeze-ernet")
    size = model.image_size
    try:
        from rtdm_tpu.models.torch_import import load_classifier_checkpoint
        variables = load_classifier_checkpoint(
            _WEIGHTS + "squeeze-ernet-state_dict.pt")
    except Exception:
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, size, size, 3), jnp.float32))
    cast = {"params": BF16_POLICY.cast_to_compute(variables["params"]),
            "batch_stats": variables["batch_stats"]}

    def cls_forward(images_u8):
        x = normalize_batch(images_u8).astype(BF16_POLICY.compute_dtype)
        return model.apply(cast, x, train=False)

    bracket("classifier",
            lambda b: jax.jit(cls_forward).lower(
                jax.ShapeDtypeStruct((b, size, size, 3), jnp.uint8)
            ).compile(),
            lambda b: (b, size, size, 3))
    bracket("yolov4_tiny",
            lambda b: _build_detector_program("yolov4-tiny-aider-416.cfg",
                                              b),
            lambda b: (b, 416, 416, 3))

    def make_cascade(b):
        cfg = _CFGS + "yolov4-tiny-aider-416.cfg"
        cls_w = _WEIGHTS + "squeeze-ernet-state_dict.pt"
        if not (os.path.exists(cfg) and os.path.exists(cls_w)):
            return None
        return build_cascade(cfg, None, "squeeze-ernet", cls_w, 416,
                             conf=0.25, iou=0.45, batch=b)

    bracket("cascade", make_cascade, lambda b: (b, 416, 416, 3))
    return out


if __name__ == "__main__":
    main()
