"""LR schedules + optimizer factory.

Mirrors the reference factories (code/disaster_detection/train.py:75-127):
optimizers adam/adamw/sgd; schedulers onecycle (pct_start=warmup_ratio,
div_factor 25, final_div_factor 1e4, cosine anneal), cosine (eta_min),
reduce-on-plateau (factor 0.1, patience epochs//3).

Everything is optax. The optimizer is wrapped in `inject_hyperparams` so the
'reduce' scheduler can rescale the live learning rate from the host between
epochs (the torch ReduceLROnPlateau analogue) without recompiling the step.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import optax

ScheduleT = Union[float, Callable[[int], float]]


def kernel_only_mask(params):
    """Weight-decay mask: True only for conv/dense kernels — biases and
    BatchNorm affine params are excluded, matching the reference's 3-group
    optimizers (yolov5/train.py:114-131, yolov3/train.py:85-105,
    pg1 = decayed weights, pg0/pg2 = undecayed bn/bias)."""
    import jax

    def is_kernel(path, leaf):
        # path can be empty when optax probes the mask with a bare scalar
        if not path or not hasattr(path[-1], "key"):
            return False
        return path[-1].key == "kernel"

    return jax.tree_util.tree_map_with_path(is_kernel, params)


def onecycle_schedule(peak_lr: float, total_steps: int,
                      pct_start: float = 0.1,
                      div_factor: float = 25.0,
                      final_div_factor: float = 1e4) -> optax.Schedule:
    """torch.optim.lr_scheduler.OneCycleLR, exactly (the reference's
    scheduler, train.py:99-116 with anneal_strategy='cos').

    torch's conventions, which optax.cosine_onecycle_schedule does NOT
    match: phase 1 ends at float(pct_start*total) - 1 (not
    int(pct_start*total)), and the final floor is initial/final_div =
    peak/(div*final_div) (optax lands 25x higher at peak/final_div);
    both phases anneal with end + (start-end)/2*(1+cos(pi*pct)).
    Verified step-for-step vs torch in tests/test_schedules_oracle.py."""
    import jax.numpy as jnp

    total_steps = max(total_steps, 2)
    initial = peak_lr / div_factor
    min_lr = initial / final_div_factor
    # torch divides by this; guard the degenerate pct_start*total <= 1
    # case (torch itself would divide by zero there)
    phase1_end = max(float(pct_start * total_steps) - 1.0, 1e-3)
    phase2_end = float(total_steps - 1)

    def schedule(step):
        s = jnp.minimum(jnp.asarray(step, jnp.float32), phase2_end)
        pct1 = jnp.clip(s / phase1_end, 0.0, 1.0)
        up = peak_lr + (initial - peak_lr) / 2.0 * (1.0 + jnp.cos(
            jnp.pi * pct1))
        pct2 = jnp.clip((s - phase1_end) / max(phase2_end - phase1_end,
                                               1e-9), 0.0, 1.0)
        down = min_lr + (peak_lr - min_lr) / 2.0 * (1.0 + jnp.cos(
            jnp.pi * pct2))
        return jnp.where(s <= phase1_end, up, down)

    return schedule


def cosine_schedule(lr: float, total_steps: int, min_lr: float = 1e-6
                    ) -> optax.Schedule:
    return optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max(total_steps, 1),
        alpha=min_lr / max(lr, 1e-12))


def make_schedule(name: str, lr: float, total_steps: int,
                  warmup_ratio: float = 0.1, min_lr: float = 1e-6) -> ScheduleT:
    name = name.lower()
    if name == "onecycle":
        return onecycle_schedule(lr, total_steps, pct_start=warmup_ratio)
    if name == "cosine":
        return cosine_schedule(lr, total_steps, min_lr)
    if name in ("reduce", "constant", "none"):
        # 'reduce' keeps a constant schedule; Trainer rescales on plateau.
        return lr
    raise ValueError(f"unknown scheduler '{name}'")


def make_optimizer(name: str,
                   learning_rate: ScheduleT,
                   weight_decay: float = 0.01,
                   momentum: float = 0.9,
                   grad_clip: Optional[float] = 1.0,
                   decay_kernels_only: bool = True
                   ) -> optax.GradientTransformation:
    """Optimizer factory. `decay_kernels_only` restricts weight decay to
    conv/dense kernels (the reference's param-group split)."""
    name = name.lower()
    mask = kernel_only_mask if decay_kernels_only else None
    if name == "adam":
        # torch Adam's weight_decay is classic L2 (added to grads), not
        # decoupled — keep that distinction.
        def adam_l2(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.adam(learning_rate),
            )
        opt = optax.inject_hyperparams(adam_l2)(learning_rate=learning_rate)
    elif name == "adamw":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay,
            mask=mask)
    elif name == "sgd":
        def sgd_wd(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.sgd(learning_rate, momentum=momentum, nesterov=True),
            )
        opt = optax.inject_hyperparams(sgd_wd)(learning_rate=learning_rate)
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    if grad_clip is not None and grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


class PlateauScaler:
    """Host-side ReduceLROnPlateau: scales the injected lr on stagnation.

    (reference: torch ReduceLROnPlateau with factor=0.1,
    patience=epochs//3 — train.py:117-124, stepped at train.py:284-285.)
    """

    def __init__(self, factor: float = 0.1, patience: int = 10,
                 min_lr: float = 1e-7, base_lr: float = 1.0,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        # torch floors the LR itself (`max(lr*factor, min_lr)`), so the
        # scale floor is min_lr relative to the schedule's base lr
        self.min_scale = min_lr / max(base_lr, 1e-30)
        self.threshold = threshold  # relative, torch's 'rel' default
        self.best = float("inf")
        self.stale = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        """Feed the epoch val loss; returns the current lr scale."""
        # rel-mode improvement test: metric < best * (1 - threshold)
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.stale = 0
        else:
            self.stale += 1
            if self.stale > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.stale = 0
        return self.scale
