"""Model summaries: parameter counts, per-module tables, FLOP estimates.

Parity with the reference's model_summary/*.txt artifacts (torchinfo
tables with params + mult-adds, e.g. squeeze_ernet.txt: 169,241 params /
45.64M mult-adds). FLOPs come from XLA's own cost analysis of the compiled
forward — the ground truth for what the chip will execute.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple


def param_table(params: Dict[str, Any], prefix: str = "") -> list:
    """[(path, shape, count)] rows over a param tree."""
    import numpy as np

    rows = []
    for key in sorted(params):
        val = params[key]
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(val, dict):
            rows.extend(param_table(val, path))
        else:
            rows.append((path, tuple(val.shape), int(np.prod(val.shape))))
    return rows


def flops_of(fn, *example_args) -> Optional[float]:
    """Total forward FLOPs from XLA cost analysis (None if unavailable)."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def summarize_classifier(name: str, batch: int = 1) -> str:
    """Summary text for an ErNET-family model (aider_train --summary)."""
    import jax
    import jax.numpy as jnp

    from rtdm_tpu.models import create_model

    model = create_model(name)
    size = model.image_size
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    rows = param_table(variables["params"])
    total = sum(r[2] for r in rows)

    def fwd(v, xi):
        return model.apply(v, xi, train=False)

    flops = flops_of(fwd, variables, x)
    lines = [f"model: {name}  input: {batch}x{size}x{size}x3 (NHWC)"]
    lines.append(f"{'module/param':<40} {'shape':<22} {'count':>10}")
    for path, shape, count in rows:
        lines.append(f"{path:<40} {str(shape):<22} {count:>10,}")
    lines.append(f"{'total params':<40} {'':<22} {total:>10,}")
    if flops:
        lines.append(f"forward FLOPs (XLA cost analysis, batch {batch}): "
                     f"{flops / 1e6:.2f} M  "
                     f"(~{flops / 2e6:.2f} M mult-adds)")
    return "\n".join(lines)


def summarize_detector(model_path: str, img_size: int = 416,
                       batch: int = 1) -> str:
    """Per-layer detector summary — the analogue of yolov5's
    `model_info()` + `forward_once(profile=True)` (torch_utils.py:203-215,
    yolo.py:142-150): one row per top-level module with its output shape
    and parameter count, plus whole-graph FLOPs from XLA cost analysis.
    Per-layer *timing* is deliberately absent: under XLA the layers fuse
    into one program, so layer walls don't exist at runtime — the honest
    per-layer numbers are shapes/params/FLOPs, and the honest timing is
    the compiled program's (bench.py / utils/profiler.py).
    """
    import re

    import flax
    import jax
    import jax.numpy as jnp

    from rtdm_tpu.export.detector import load_detection_model

    model, variables, _ = load_detection_model(model_path, None, img_size)
    x = jnp.zeros((batch, img_size, img_size, 3), jnp.float32)
    _, st = model.apply(variables, x, train=False,
                        capture_intermediates=True,
                        mutable=["intermediates"])
    inter = flax.traverse_util.flatten_dict(st["intermediates"])
    # one row per top-level module, in construction order
    shapes: Dict[str, Tuple[int, ...]] = {}
    for key, val in inter.items():
        top = key[0]
        if key[-1] != "__call__" or len(key) != 2:
            continue
        out = val[0]
        leaves = [o for o in jax.tree_util.tree_leaves(out)
                  if hasattr(o, "shape")]
        if leaves:
            shapes[top] = tuple(leaves[-1].shape)
    pcounts: Dict[str, int] = {}
    import numpy as np
    for key, leaf in flax.traverse_util.flatten_dict(
            variables.get("params", {})).items():
        pcounts[key[0]] = pcounts.get(key[0], 0) + int(np.prod(leaf.shape))

    def order(name: str) -> Tuple[int, str]:
        m = re.search(r"(\d+)", name)
        return (int(m.group(1)) if m else 10 ** 9, name)

    names = sorted(set(shapes) | set(pcounts), key=order)
    lines = [f"model: {model_path}  "
             f"input: {batch}x{img_size}x{img_size}x3 (NHWC)"]
    lines.append(f"{'layer':<28} {'output shape':<26} {'params':>12}")
    for n in names:
        lines.append(f"{n:<28} {str(shapes.get(n, '-')):<26} "
                     f"{pcounts.get(n, 0):>12,}")
    total = sum(pcounts.values())
    lines.append(f"{'total params':<28} {'':<26} {total:>12,}")
    flops = flops_of(
        lambda v, xi: model.apply(v, xi, train=False), variables, x)
    if flops:
        lines.append(f"forward FLOPs (XLA cost analysis, batch {batch}): "
                     f"{flops / 1e9:.3f} G")
    return "\n".join(lines)
