"""Multi-host runtime initialisation.

Replaces the reference's NCCL process-group bring-up
(src/utils/misc.py:209-233: env-var rendezvous, SLURM fallback, barrier,
rank-0-only printing) with ``jax.distributed.initialize``:

- coordinator/process env comes from the standard JAX variables
  (``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/``PROCESS_ID``) or SLURM — both
  are auto-detected by JAX's cluster environment support;
- single-process runs fall through silently (misc.py:217-221 parity);
- collectives need no backend selection: XLA routes them over ICI within a
  slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax

from ..utils.logging import log, set_logging_enabled

_INITIALIZED = False


def init_distributed_mode(config: Optional[Dict[str, Any]] = None,
                          with_time: bool = True) -> None:
    """Idempotent multi-host init + rank-0 logging setup.

    ``config`` is the legacy ``ddp`` config section; its ``distributed``
    field is updated in place for config-surface parity (the reference's
    ``dist_backend`` key is accepted and ignored — there is nothing to
    choose on TPU)."""
    global _INITIALIZED
    explicit = (
        "COORDINATOR_ADDRESS" in os.environ
        or "SLURM_PROCID" in os.environ
        or os.environ.get("JAX_NUM_PROCESSES")
    )
    if explicit and not _INITIALIZED:
        jax.distributed.initialize()
        _INITIALIZED = True
        log(
            f"| distributed init (process {jax.process_index()}/"
            f"{jax.process_count()})", force=True,
        )
    elif not explicit:
        if config is not None:
            config["distributed"] = jax.device_count() > 1
    if config is not None:
        config["rank"] = jax.process_index()
        config["world_size"] = jax.process_count()
        if explicit:
            config["distributed"] = True
    set_logging_enabled(is_main_process())


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0
