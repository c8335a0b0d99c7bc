"""Unified classifier trainer — data-parallel over a device mesh.

TPU-native re-design of the reference training loop
(code/disaster_detection/train.py:129-360 +
training_utils/train_utils.py:16-177):

- One jitted `train_step` fuses forward, loss, backward, grad-accum,
  clipping, optimizer update and BN running-stat update into a single XLA
  program (the reference spreads these over Python + autocast + GradScaler).
- Data parallelism is GSPMD: the batch is sharded over the mesh 'data' axis,
  params/opt-state are replicated, and XLA inserts the gradient psum — the
  DDP/NCCL analogue with zero model-code changes (yolov3/train.py:159-170).
- BatchNorm statistics are computed on the *global* (cross-replica) batch
  automatically under jit-over-mesh — SyncBatchNorm for free
  (yolov3/models.py:36).
- bf16 compute / fp32 params via core.precision (no GradScaler needed:
  bf16 shares float32's exponent range).
- Gradient accumulation runs as a lax.scan over microbatches inside the
  step (train_utils.py:58-73's Python-side accumulation, compiled).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtdm_tpu.core.precision import Policy, DEFAULT_POLICY


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model: nn.Module, tx: optax.GradientTransformation,
                       rng: jax.Array, input_shape: Tuple[int, ...]) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model: nn.Module,
                    tx: optax.GradientTransformation,
                    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
                    policy: Policy = DEFAULT_POLICY,
                    grad_accum_steps: int = 1,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    mixup_alpha: float = 0.0,
                    cutmix_alpha: float = 0.0):
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    mixup_alpha/cutmix_alpha > 0 enable device-side batch mixing
    (train/batch_augment.py); when both are set, each microbatch picks one
    with equal probability.
    """
    from rtdm_tpu.train.batch_augment import cutmix_batch, mixup_batch

    def maybe_mix(rng, images):
        """-> (images, perm, lam); identity when mixing is off."""
        if mixup_alpha <= 0 and cutmix_alpha <= 0:
            return images, jnp.arange(images.shape[0]), jnp.float32(1.0)
        k_sel, k_mix = jax.random.split(rng)
        if mixup_alpha > 0 and cutmix_alpha > 0:
            return jax.lax.cond(
                jax.random.bernoulli(k_sel),
                lambda: mixup_batch(k_mix, images, mixup_alpha),
                lambda: cutmix_batch(k_mix, images, cutmix_alpha))
        if mixup_alpha > 0:
            return mixup_batch(k_mix, images, mixup_alpha)
        return cutmix_batch(k_mix, images, cutmix_alpha)

    def microbatch_grads(params, batch_stats, images, labels, rng):
        rng_mix, rng_drop = jax.random.split(rng)
        images, perm, lam = maybe_mix(rng_mix, images)

        def loss_of(params):
            variables = {"params": policy.cast_to_compute(params),
                         "batch_stats": batch_stats}
            logits, mutated = model.apply(
                variables, policy.cast_to_compute(images),
                train=True, apply_softmax=False,
                mutable=["batch_stats"], rngs={"dropout": rng_drop})
            logits32 = logits.astype(jnp.float32)
            loss = (lam * loss_fn(logits32, labels)
                    + (1.0 - lam) * loss_fn(logits32, labels[perm]))
            return loss, (mutated["batch_stats"], logits)
        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        return loss, grads, new_stats, logits

    def step(state: TrainState, images: jax.Array, labels: jax.Array,
             rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        if grad_accum_steps <= 1:
            loss, grads, new_stats, logits = microbatch_grads(
                state.params, state.batch_stats, images, labels, rng)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        else:
            a = grad_accum_steps
            mb_images = images.reshape((a, -1) + images.shape[1:])
            mb_labels = labels.reshape((a, -1) + labels.shape[1:])

            def body(carry, mb):
                stats, grad_sum, loss_sum, acc_sum, i = carry
                imgs, lbls = mb
                loss, grads, stats, logits = microbatch_grads(
                    state.params, stats, imgs, lbls,
                    jax.random.fold_in(rng, i))
                acc = jnp.mean(
                    (jnp.argmax(logits, -1) == lbls).astype(jnp.float32))
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
                return (stats, grad_sum, loss_sum + loss, acc_sum + acc,
                        i + 1), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, grads, loss, acc, _), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, jnp.zeros(()), jnp.zeros(()),
                 jnp.zeros((), jnp.int32)),
                (mb_images, mb_labels))
            grads = jax.tree_util.tree_map(lambda g: g / a, grads)
            loss = loss / a
            acc = acc / a

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "accuracy": acc, "grad_norm": gnorm}

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step,
                       in_shardings=(repl, data, data, repl),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: nn.Module, policy: Policy = DEFAULT_POLICY,
                   loss_fn: Optional[Callable] = None,
                   num_classes: int = 5,
                   mesh: Optional[Mesh] = None):
    """(state, images, labels, valid) -> per-batch metrics incl. confusion
    counts. `valid` is the number of real (non-padded) rows: eval batches
    are zero-padded to a fixed shape so jit never sees dynamic shapes."""

    def step(state: TrainState, images: jax.Array, labels: jax.Array,
             valid: jax.Array) -> Dict[str, jax.Array]:
        variables = {"params": policy.cast_to_compute(state.params),
                     "batch_stats": state.batch_stats}
        logits = model.apply(variables, policy.cast_to_compute(images),
                             train=False, apply_softmax=False)
        logits = logits.astype(jnp.float32)
        preds = jnp.argmax(logits, -1)
        mask = (jnp.arange(labels.shape[0]) < valid)
        out = {
            "correct": jnp.sum(((preds == labels) & mask).astype(jnp.int32)),
            "count": valid.astype(jnp.int32),
            "confusion": _confusion(labels, preds, num_classes, mask),
        }
        if loss_fn is not None:
            per_ex = loss_fn(logits, labels, reduction="none")
            out["loss_sum"] = jnp.sum(jnp.where(mask, per_ex, 0.0))
        return out

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(repl, data, data, repl),
                       out_shardings=repl)
    return jax.jit(step)


def _confusion(labels: jax.Array, preds: jax.Array, n: int,
               mask: jax.Array) -> jax.Array:
    """n x n confusion-count matrix, rows = true class; masked rows drop."""
    idx = labels * n + preds
    return jnp.bincount(idx, weights=mask.astype(jnp.int32),
                        length=n * n).reshape(n, n)


class Trainer:
    """Thin epoch-loop orchestrator over the jitted steps.

    Deliberately minimal: the heavy lifting (metrics aggregation, plateau
    scheduling, early stopping, checkpointing) is composed in cli/aider_train
    from the pieces in train/ and utils/ — keeping this class jit-friendly
    and stateless between epochs.
    """

    def __init__(self, model, tx, loss_fn, policy=DEFAULT_POLICY,
                 grad_accum_steps=1, mesh=None, num_classes=5,
                 eval_loss_fn=None, mixup_alpha=0.0, cutmix_alpha=0.0):
        self.model = model
        self.tx = tx
        self.mesh = mesh
        self.train_step = make_train_step(model, tx, loss_fn, policy,
                                          grad_accum_steps, mesh,
                                          mixup_alpha=mixup_alpha,
                                          cutmix_alpha=cutmix_alpha)
        self.eval_step = make_eval_step(model, policy,
                                        eval_loss_fn or loss_fn,
                                        num_classes, mesh)

    def init_state(self, rng, input_shape):
        state = create_train_state(self.model, self.tx, rng, input_shape)
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            state = jax.device_put(state, repl)
        return state
