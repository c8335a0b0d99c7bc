"""Collective-communication vocabulary over the device mesh.

The single `comms` surface replacing the reference's NCCL plumbing
(SURVEY §2.5): torch.distributed init/allreduce/broadcast
(yolov3/train.py:159-170, yolov5/train.py:218-222,258-263) map to XLA
collectives over ICI/DCN. Under plain jit-over-mesh (GSPMD) most of these
are implicit — XLA inserts them from shardings; these explicit wrappers
are for shard_map/pmap code paths where per-device programs are written by
hand (sync-BN, halo exchange, metric gathering).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def psum_along(tree: Any, axis_name: str) -> Any:
    """Gradient/stat all-reduce (DDP allreduce analogue)."""
    return jax.lax.psum(tree, axis_name)


def pmean_grads(grads: Any, axis_name: str = "data") -> Any:
    """Average gradients across replicas — the reference scales loss by
    world_size then lets DDP mean (yolov5/train.py:304-305); on TPU a
    single pmean expresses the same."""
    return jax.lax.pmean(grads, axis_name)


def all_gather_along(x: jax.Array, axis_name: str, axis: int = 0) -> jax.Array:
    """Gather per-replica shards (eval-metric gathering analogue)."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def broadcast_from(x: jax.Array, axis_name: str, src: int = 0) -> jax.Array:
    """One-to-all broadcast (dist.broadcast of image-weight indices,
    yolov5/train.py:258-263): select src's value on every member."""
    gathered = jax.lax.all_gather(x, axis_name)
    return jax.tree_util.tree_map(lambda g: g[src], gathered)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place host arrays with the leading dim sharded over `axis`."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
