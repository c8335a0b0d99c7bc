"""Device-mesh runtime initialisation.

TPU-native replacement for the reference's torch.distributed/NCCL bring-up
(reference: code/victim_localization/yolov3/train.py:159-168 — NCCL TCP
rendezvous; yolov5/train.py:218-222 — DDP wrap). On TPU, parallelism is
expressed once as a `jax.sharding.Mesh` and XLA inserts the collectives
(psum/pmean over ICI); there is no process-group plumbing in model code.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise multi-host JAX (the `dist.init_process_group` analogue).

    On a single host this is a no-op. On a multi-host TPU pod the explicit
    args, the JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env
    vars (resolved here so the env-driven path takes the same code path
    as explicit args), or a recognised cluster env (SLURM/Cloud TPU —
    auto-resolved by jax) drive `jax.distributed.initialize`, after which
    `jax.devices()` is global and a Mesh spans the slice (ICI) or multiple
    slices (DCN). Exercised by the two-process CPU test in
    tests/test_parallel.py (Gloo collectives).
    """
    import os

    # env fallbacks mirror torchrun's MASTER_ADDR/WORLD_SIZE/RANK triple
    # (the NCCL rendezvous this replaces, yolov3/train.py:159-168)
    if coordinator_address is None:
        coordinator_address = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                               or os.environ.get("COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    if (coordinator_address
            or os.environ.get("SLURM_JOB_NUM_NODES", "1") not in ("", "1")):
        # coordinator without an explicit process count, or a cluster env
        # (SLURM plugin): let jax auto-resolve the rest — silently
        # skipping here would run N independent single-host jobs instead
        # of one distributed job
        jax.distributed.initialize(coordinator_address=coordinator_address)


def create_mesh(axis_shapes: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("data",),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a named device mesh.

    Default is a 1-D `('data',)` mesh over all devices — the TPU equivalent of
    the reference's pure data parallelism (DDP). Extra axes ('model', 'spatial')
    can be requested for tensor/spatial sharding of large aerial frames.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if axis_shapes is None:
        axis_shapes = (len(devices),) + (1,) * (len(axis_names) - 1)
    if math.prod(axis_shapes) != len(devices):
        raise ValueError(
            f"mesh axes {tuple(axis_shapes)} != #devices {len(devices)}")
    return Mesh(devices.reshape(axis_shapes), axis_names)


def local_mesh(n: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over the first `n` local devices (all if None)."""
    devs = jax.devices()[: n or len(jax.devices())]
    shapes = (len(devs),) + (1,) * (len(axis_names) - 1)
    return create_mesh(shapes, axis_names, devs)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def require_data_divisible(batch: int, mesh: Mesh, label: str = "batch"
                           ) -> int:
    """Validate that `batch` splits evenly over the mesh's 'data' axis;
    returns the axis extent. One spelling of the check for every serving
    surface (Engine/Detector/CLIs)."""
    n = mesh.shape["data"]
    if batch % n:
        raise ValueError(f"{label} {batch} must divide over the {n}-way "
                         f"'data' mesh axis")
    return n
