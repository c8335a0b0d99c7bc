"""Explicit-SPMD building blocks: shard_map train step + spatial sharding.

Two things the implicit GSPMD path doesn't show directly:

1. `make_shard_map_train_step` — the classifier train step written as an
   explicit per-device program (shard_map over the 'data' axis) with
   hand-placed collectives: lax.pmean for gradients (the DDP allreduce,
   yolov3/train.py:169-170) and cross-replica BatchNorm via the models'
   `bn_axis` (SyncBatchNorm, yolov3/models.py:36). Numerically identical
   to the GSPMD step when dropout is off (tests/test_parallel.py); with
   dropout on, each replica folds its axis index into the key for an
   independent stream — DDP semantics, deliberately unlike the
   single-global-mask GSPMD step. Exists so the collective structure is
   explicit, testable, and extensible.

2. `spatial_shard_conv` — halo-exchange convolution over a 'spatial' mesh
   axis via lax.ppermute: the TPU-native answer to "the frame is too large
   for one chip" (SURVEY §5's long-context analogue: the reference scales
   spatial resolution, not sequence length). Rows are sharded across
   devices; each step exchanges k//2 boundary rows with neighbours, then
   runs a normal XLA conv on the haloed block.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import optax

from rtdm_tpu.ops.convpool import conv2d


def make_shard_map_train_step(model, tx, loss_fn, mesh: Mesh,
                              axis: str = "data"):
    """Explicit data-parallel train step: per-device grads + pmean.

    The model must be constructed with `bn_axis=axis` so BatchNorm pmeans
    its batch statistics (true SyncBatchNorm) — under shard_map, plain
    jnp.mean only sees the local shard.
    """

    def per_device(params, batch_stats, opt_state, images, labels, rng):
        # independent per-replica dropout streams (DDP semantics): the
        # replicated key folded with the device index — identical masks on
        # every shard would correlate the regularization across replicas
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_of(p):
            variables = {"params": p, "batch_stats": batch_stats}
            logits, mutated = model.apply(
                variables, images, train=True, apply_softmax=False,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return loss_fn(logits.astype(jnp.float32), labels), \
                mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)        # DDP allreduce
        loss = jax.lax.pmean(loss, axis)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss

    repl = P()
    data = P(axis)
    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(repl, repl, repl, data, data, repl),
        out_specs=(repl, repl, repl, repl),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0, 1, 2))


def spatial_shard_conv(x_sharded: jax.Array, kernel: jax.Array,
                       mesh: Mesh, axis: str = "spatial",
                       bias: Optional[jax.Array] = None) -> jax.Array:
    """SAME conv over an H-sharded NHWC tensor with ppermute halo exchange.

    x_sharded: (N, H, W, C) with H split over `axis`. kernel: HWIO with odd
    kH. Result matches the unsharded
    conv2d(x, kernel, padding=(kH//2, kW//2)).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    halo = kh // 2
    pad_w = kw // 2  # horizontal SAME padding follows kW, not the halo
    n_dev = mesh.shape[axis]

    def per_device(xs, k, b):
        if halo == 0:
            # 1-row kernels need no exchange (and xs[:, -0:] would slice
            # the WHOLE shard, doubling the padded height)
            return conv2d(xs, k, b, stride=1, padding=(0, pad_w))
        idx = jax.lax.axis_index(axis)
        up = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        down = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        # receive bottom rows of the previous shard / top rows of the next
        top_halo = jax.lax.ppermute(xs[:, -halo:], axis, up)
        bot_halo = jax.lax.ppermute(xs[:, :halo], axis, down)
        # first/last shard get zero padding instead of wrapped halos
        zeros = jnp.zeros_like(top_halo)
        top_halo = jnp.where(idx == 0, zeros, top_halo)
        bot_halo = jnp.where(idx == n_dev - 1, zeros, bot_halo)
        padded = jnp.concatenate([top_halo, xs, bot_halo], axis=1)
        out = conv2d(padded, k, b, stride=1, padding=(0, pad_w))
        return out

    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False)
    b = bias if bias is not None else jnp.zeros((kernel.shape[-1],),
                                                kernel.dtype)
    return jax.jit(mapped)(x_sharded, kernel, b)
