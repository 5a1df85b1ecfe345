"""Device mesh + sharding helpers — the framework's parallelism substrate.

The reference's only parallelism is DDP over NCCL (SURVEY §2 ⑬-⑭:
torch DDP + SyncBN + DistributedSampler). Here the equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis plus ``seq`` and ``model``
axes for sequence/tensor parallelism:

- batches are sharded ``P('data')`` on their leading axis (plus ``seq``
  on the trailing time axis when ``parallel.seq_parallel > 1``);
- parameters are replicated (or sharded on ``model`` where a rule matches);
- gradient all-reduce, SyncBN statistics, and eval gathers all come out of
  GSPMD partitioning of the jitted step — no hand-written collectives on the
  data path, so everything rides ICI at XLA's schedule.

Sequence parallelism (``parallel.seq_parallel``) shards the *time* axis
of every batch array across the ``seq`` mesh axis and lets GSPMD
spatially partition the 1-D convolutions (halo exchange via
collective-permute) — per-device activation memory drops by the seq
factor, which is what makes Holter-scale records (minutes-to-hours of
signal, T ≫ 10^5) trainable/servable at all: batch-axis sharding cannot
cut the per-sample activation footprint, time-axis sharding can. BN
statistics and loss means reduce over (batch, time), so the same GSPMD
partitioning that gives SyncBN over ``data`` gives it over ``seq``.

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
SEQ_AXIS = "seq"
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
    """Build a ``(data, seq, model)`` mesh over all (or given) devices.

    ``config['parallel']['model_parallel']`` (default 1) splits off a model
    axis, ``config['parallel']['seq_parallel']`` (default 1) a sequence
    axis; the remaining devices form the data axis. With the shipped
    configs this is a pure data-parallel mesh — the reference's DDP
    capability — but the extra axes are first-class so TP/SP shardings
    compile today.

    The built mesh is registered as the process-wide *current mesh*
    (:func:`get_current_mesh`), which mesh-aware ops consult at trace time.
    One driver (train/test/inference) builds one mesh per phase with the
    same devices, so re-registration is idempotent (Mesh equality is
    structural); if you interleave *different* device subsets or axis
    splits in one process, re-call ``make_mesh`` (or ``set_current_mesh``)
    before tracing computations for each.
    """
    devices = list(devices if devices is not None else jax.devices())
    model, seq = 1, 1
    if config is not None:
        par = config.get("parallel", {}) or {}
        model = int(par.get("model_parallel", 1) or 1)
        seq = int(par.get("seq_parallel", 1) or 1)
    n = len(devices)
    assert n % (model * seq) == 0, (
        f"{n} devices not divisible by model_parallel={model} "
        f"x seq_parallel={seq}")
    if (model * seq) > 1 and jax.process_count() > 1:
        # hosts contribute whole data rows: shard_batch assembles global
        # arrays from per-host *batch rows* (each host's loader yields its
        # data shards with the full time axis), so a (seq, model) tile
        # must never straddle a process boundary. Validate the devices
        # actually forming this mesh, not jax.local_devices() — a caller
        # may build over a subset.
        per_proc: Dict[int, int] = {}
        for d in devices:
            per_proc[d.process_index] = per_proc.get(d.process_index, 0) + 1
        bad = {p: c for p, c in per_proc.items() if c % (model * seq) != 0}
        assert not bad, (
            f"model_parallel={model} x seq_parallel={seq} must divide each "
            f"process's device count (got {per_proc}): non-data mesh axes "
            "are host-local (per-host loaders shard batch rows, not the "
            "time axis)")
    if (model * seq) > 1 and jax.process_count() > 1:
        # counts dividing is necessary but not sufficient: a devices list
        # not grouped contiguously by process would still reshape a
        # (seq, model) tile across two hosts. Group by process first
        # (stable, so intra-process device order is preserved), then
        # verify every tile really is single-process.
        devices = sorted(devices, key=lambda d: d.process_index)
        tiles = np.asarray(devices).reshape(-1, model * seq)
        for tile in tiles:
            procs = {d.process_index for d in tile}
            assert len(procs) == 1, (
                f"(seq={seq}, model={model}) tile straddles processes "
                f"{sorted(procs)}: non-data mesh axes must be host-local")
    dev_array = np.asarray(devices).reshape(n // (model * seq), seq, model)
    mesh = Mesh(dev_array, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
    set_current_mesh(mesh)
    return mesh


def data_parallel_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def seq_parallel_size(mesh: Mesh) -> int:
    """Size of the ``seq`` axis; 1 for meshes built without one."""
    return dict(mesh.shape).get(SEQ_AXIS, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (scan_steps, batch, ...) stacks: data axis on dim 1."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


# a trailing dim this short is a feature/stat axis, not a time axis —
# real signal lengths are hundreds to millions of samples. Guards the
# time-axis heuristic below against sharding e.g. a (B, 4) per-sample
# stats array over `seq` just because 4 happens to divide.
_MIN_TIME_DIM = 32


# trailing-dim lengths already warned about (once per shape, per process):
# a ragged time axis under seq_parallel runs correct-but-seq-replicated,
# which silently defeats the knob — say so exactly once
_WARNED_RAGGED: set = set()


def _array_sharding(mesh: Mesh, arr, base: Sequence) -> NamedSharding:
    """Per-array batch spec: ``base`` entries (leading dims), plus the
    ``seq`` axis on the trailing time dim when the mesh has one, the dim
    divides evenly, and it is long enough to actually be a time axis
    (``_MIN_TIME_DIM * seq``). 1-D arrays (ids, cache indices), short
    trailing dims, and ragged trailing dims stay seq-replicated —
    correct, just not time-sharded."""
    sq = seq_parallel_size(mesh)
    ndim = getattr(arr, "ndim", 0)
    if (sq > 1 and ndim > len(base) and arr.shape[-1] % sq == 0
            and arr.shape[-1] >= _MIN_TIME_DIM * sq):
        entries = list(base) + [None] * (ndim - len(base))
        entries[-1] = SEQ_AXIS
        return NamedSharding(mesh, P(*entries))
    if (sq > 1 and ndim > len(base)
            and arr.shape[-1] >= _MIN_TIME_DIM * sq
            and arr.shape[-1] % sq != 0
            and arr.shape[-1] not in _WARNED_RAGGED):
        # long enough to be a time axis, failed ONLY divisibility: the
        # user asked for seq_parallel but this array keeps the full
        # per-sample activation footprint on every seq rank
        _WARNED_RAGGED.add(arr.shape[-1])
        import logging

        logging.getLogger(__name__).warning(
            "seq_parallel=%d requested but trailing time dim %d is not "
            "divisible by it — this array stays seq-REPLICATED (full "
            "per-sample footprint on every seq rank). Pad/crop the "
            "signal length to a multiple of seq_parallel to get the "
            "memory saving.", sq, arr.shape[-1])
    return NamedSharding(mesh, P(*base))


def shard_stacked_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    return _place(mesh, batch, (None, DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host batch dict onto the mesh, sharded over ``data`` (and
    ``seq`` on the time axis under sequence parallelism).

    Single-process: a plain ``device_put`` with a NamedSharding (the loader
    already emits replica-major batches). Multi-process: assembles the
    global array from each host's local shard.
    """
    return _place(mesh, batch, (DATA_AXIS,))


def _place(mesh: Mesh, batch: Dict[str, np.ndarray], base: Sequence):
    shardings = {k: _array_sharding(mesh, v, base) for k, v in batch.items()}
    if jax.process_count() == 1:
        return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(shardings[k], v)
        for k, v in batch.items()
    }
