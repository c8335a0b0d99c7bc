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
