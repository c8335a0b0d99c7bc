"""Mixed-precision policy.

TPU-native replacement for torch.cuda.amp autocast + GradScaler (reference:
code/disaster_detection/training_utils/train_utils.py:53-61). bfloat16 has
the same exponent range as float32, so no loss scaling is required — the
policy simply casts activations/compute to bf16 and keeps params/optimizer
state in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def _cast_floating(tree: Any, dtype) -> Any:
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


@dataclasses.dataclass(frozen=True)
class Policy:
    """What dtype each tensor class lives in."""
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return _cast_floating(tree, self.compute_dtype)

    def cast_to_param(self, tree):
        return _cast_floating(tree, self.param_dtype)

    def cast_to_output(self, tree):
        return _cast_floating(tree, self.output_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
BF16_POLICY = Policy()


def policy_from_name(name: str) -> Policy:
    name = name.lower()
    if name in ("fp32", "float32", "f32"):
        return FP32_POLICY
    if name in ("bf16", "bfloat16", "fp16", "half", "mixed"):
        # fp16 requests map to bf16 — the TPU-native half precision.
        return BF16_POLICY
    raise ValueError(f"unknown precision policy: {name}")
