"""Per-layer FLOPs/params/time profiling for yaml-driven models.

TPU-native analogue of the reference's `Model.forward_once(profile=True)`
(yolov5/models/yolo.py:142-150), which thop-counts FLOPs and 10-run-times
each module eagerly. Under XLA the whole graph is one fused program, so
per-layer numbers are measured as PREFIX DELTAS instead: for each layer k
the prefix program `model(x, up_to=k)` is compiled, its XLA
`cost_analysis()` flops and best-of-`iters` wall time recorded, and layer
k's cost is prefix(k) - prefix(k-1). Exact for FLOPs (XLA's own count);
timing deltas inherit fusion effects, which is the honest number on this
hardware (a layer that fuses away costs ~0).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List

import jax
import numpy as np

__all__ = ["profile_prefix_layers", "profile_v5_layers",
           "format_profile_table"]


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)) if isinstance(ca, dict) else 0.0


def _params_of_layer(params: Dict[str, Any], i: int) -> int:
    """Sum params whose top-level collection name belongs to layer i
    (names are m{i}, m{i}_{j} for Sequential repetition, m{i}_m{j} for
    Detect heads)."""
    n = 0
    pre = f"m{i}"
    for name, tree in params.items():
        if name == pre or name.startswith(pre + "_"):
            n += sum(int(np.prod(p.shape))
                     for p in jax.tree_util.tree_leaves(tree))
    return n


def profile_prefix_layers(prefix_fn: Callable[[int], Callable],
                          modules: List[str], params: Dict[str, Any],
                          iters: int = 10) -> List[Dict[str, Any]]:
    """Generic prefix-delta profiler.

    prefix_fn(k) must return a zero-arg callable that runs the jitted
    prefix program through layer k and blocks on the result; it is also
    lowered once for cost_analysis. modules[k] labels layer k.
    """
    rows: List[Dict[str, Any]] = []
    prev_flops, prev_t = 0.0, 0.0
    for k, mod in enumerate(modules):
        run, compiled = prefix_fn(k)
        run()  # warm
        best = min(_timed(run) for _ in range(max(iters, 1)))
        flops = _flops_of(compiled)
        rows.append({
            "i": k, "module": mod,
            "params": _params_of_layer(params, k),
            "flops": max(flops - prev_flops, 0.0),
            "dt_ms": max((best - prev_t) * 1e3, 0.0),
        })
        prev_flops, prev_t = flops, best
    return rows


def _timed(run) -> float:
    t0 = time.perf_counter()
    run()
    return time.perf_counter() - t0


def profile_v5_layers(model, variables, x, iters: int = 10
                      ) -> List[Dict[str, Any]]:
    """Per-layer table for a YoloV5 yaml graph (uses __call__'s `up_to`)."""
    from rtdm_tpu.models.yolov5 import build_plan, parse_v5_yaml

    plan = build_plan(parse_v5_yaml(model.yaml_text, model.num_classes))
    modules = [e["module"] for e in plan]

    def prefix_fn(k):
        f = jax.jit(lambda v, a: model.apply(v, a, train=False, up_to=k))
        compiled = f.lower(variables, x).compile()

        def run():
            out = compiled(variables, x)
            jax.tree_util.tree_map(
                lambda t: np.asarray(t),
                out if isinstance(out, (list, tuple)) else [out])

        return run, compiled

    return profile_prefix_layers(prefix_fn, modules, variables["params"],
                                 iters)


def format_profile_table(rows: List[Dict[str, Any]]) -> str:
    """Reference-style table: time(ms)  GFLOPs  params  module
    (yolo.py:150 print format)."""
    lines = [f"{'time (ms)':>10} {'GFLOPs':>10} {'params':>10}  module"]
    for r in rows:
        lines.append(f"{r['dt_ms']:10.2f} {r['flops'] / 1e9:10.4f} "
                     f"{r['params']:10d}  {r['i']}: {r['module']}")
    tot_t = sum(r["dt_ms"] for r in rows)
    tot_f = sum(r["flops"] for r in rows)
    tot_p = sum(r["params"] for r in rows)
    lines.append(f"{tot_t:10.2f} {tot_f / 1e9:10.4f} {tot_p:10d}  total")
    return "\n".join(lines)
