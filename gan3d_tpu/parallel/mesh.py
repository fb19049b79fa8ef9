"""Device mesh construction and canonical shardings."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0,
              devices: Optional[Sequence[jax.Device]] = None,
              spatial: int = 1, model: int = 1) -> Mesh:
    """Device mesh over the first `num_devices` devices (0 = all).

    spatial == model == 1 (default): 1-D ("data",) data-parallel mesh.
    spatial  > 1: 2-D ("data", "space") mesh — batches shard their leading
    axis over "data" and the volume's depth axis over "space"; XLA's SPMD
    partitioner inserts the conv halo exchanges (the volumetric analog of
    context parallelism — SURVEY §5.7). Adjacent devices share a spatial
    group so halo traffic rides neighboring ICI links.
    model > 1: 2-D ("data", "model") mesh — wide layer weights shard their
    output-channel dim over "model" (parallel/tp.py); adjacent devices
    share a model group so the per-layer collectives ride neighboring ICI.
    """
    if spatial > 1 and model > 1:
        raise ValueError("spatial and model parallelism cannot be combined "
                         "yet — pick one of spatial_devices/model_devices")
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    inner = spatial if spatial > 1 else model
    if inner <= 1:
        return Mesh(np.asarray(devs), (DATA_AXIS,))
    if len(devs) % inner:
        raise ValueError(
            f"{len(devs)} devices not divisible by {inner}")
    grid = np.asarray(devs).reshape(len(devs) // inner, inner)
    axis = SPACE_AXIS if spatial > 1 else MODEL_AXIS
    return Mesh(grid, (DATA_AXIS, axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with its leading axis sharded over the mesh."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated_sharding(mesh))


def init_distributed(cfg) -> None:
    """Multi-host setup over DCN (call before any backend use). The same
    jit-SPMD training program then runs unchanged: the mesh spans all global
    devices and XLA routes the gradient all-reduce over ICI within a slice
    and DCN across slices."""
    if not getattr(cfg, "distributed", False):
        return
    kwargs = {}
    if cfg.coordinator_address:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes:
        kwargs["num_processes"] = cfg.num_processes
    if cfg.process_id >= 0:
        kwargs["process_id"] = cfg.process_id
    jax.distributed.initialize(**kwargs)


def put_global_batch(mesh: Mesh, local_batch, spec: P = None):
    """Assemble a globally-sharded batch from per-process local data.

    Single-process: plain device_put. Multi-host: each process contributes
    its local shard of the leading batch axis via
    jax.make_array_from_process_local_data.
    """
    sharding = NamedSharding(mesh, spec if spec is not None else P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
