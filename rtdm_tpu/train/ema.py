"""Model EMA — parameter exponential moving average with warm-up ramp.

Reference: yolov5/utils/torch_utils.py:276-306 ModelEMA —
decay(step) = base_decay * (1 - exp(-step / 2000)), applied to params and
(here) batch_stats. Pure-pytree update, safe to call inside or outside jit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(tree: Any) -> Any:
    # Deep copy: the source tree's buffers may be donated to a jitted step
    # later; the EMA must own its storage.
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)


def ema_update(ema_tree: Any, new_tree: Any, step: jax.Array,
               base_decay: float = 0.9999, tau: float = 2000.0) -> Any:
    """One EMA step with the ramped decay schedule."""
    d = base_decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / tau))

    def upd(e, p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating):
            return e * d + p.astype(e.dtype) * (1.0 - d)
        return p
    return jax.tree_util.tree_map(upd, ema_tree, new_tree)
