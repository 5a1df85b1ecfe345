"""Device mesh + sharding helpers — the framework's parallelism substrate.

The reference's only parallelism is DDP over NCCL (SURVEY §2 ⑬-⑭:
torch DDP + SyncBN + DistributedSampler). Here the equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis plus a ``model`` axis stub for
tensor parallelism:

- batches are sharded ``P('data')`` on their leading axis;
- parameters are replicated (or sharded on ``model`` where a rule matches);
- gradient all-reduce, SyncBN statistics, and eval gathers all come out of
  GSPMD partitioning of the jitted step — no hand-written collectives on the
  data path, so everything rides ICI at XLA's schedule.

Multi-host: each process passes its ``jax.local_devices()`` contribution;
``shard_batch`` forms the global array from per-host shards
(``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# the most recently built training mesh; mesh-aware ops (e.g. the Pallas
# flash-attention shard_map wrapper) consult it because pallas_call has no
# GSPMD partitioning rule and would otherwise be computed fully replicated
_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def get_current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def make_mesh(
    config: Optional[Dict[str, Any]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over all (or given) devices.

    ``config['parallel']['model_parallel']`` (default 1) splits off a model
    axis; the remaining devices form the data axis. With the shipped configs
    this is a pure data-parallel mesh — the reference's DDP capability — but
    the model axis is first-class so TP shardings compile today.

    The built mesh is registered as the process-wide *current mesh*
    (:func:`get_current_mesh`), which mesh-aware ops consult at trace time.
    One driver (train/test/inference) builds one mesh per phase with the
    same devices, so re-registration is idempotent (Mesh equality is
    structural); if you interleave *different* device subsets or axis
    splits in one process, re-call ``make_mesh`` (or ``set_current_mesh``)
    before tracing computations for each.
    """
    devices = list(devices if devices is not None else jax.devices())
    model = 1
    if config is not None:
        model = int(config.get("parallel", {}).get("model_parallel", 1) or 1)
    n = len(devices)
    assert n % model == 0, f"{n} devices not divisible by model_parallel={model}"
    dev_array = np.asarray(devices).reshape(n // model, model)
    mesh = Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
    set_current_mesh(mesh)
    return mesh


def data_parallel_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (scan_steps, batch, ...) stacks: data axis on dim 1."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_stacked_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    sharding = stacked_batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host batch dict onto the mesh, sharded over ``data``.

    Single-process: a plain ``device_put`` with a NamedSharding (the loader
    already emits replica-major batches). Multi-process: assembles the
    global array from each host's local shard.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
