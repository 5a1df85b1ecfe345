"""Learning-rate schedules as pure functions of fractional epoch.

Parity targets (reference src/utils/lr_sched.py):
- ``cosine_warmup_lr`` == ``adjust_learning_rate`` (lr_sched.py:6-18): linear
  warmup from 0 over ``warmup_epochs`` then half-cosine from ``lr`` to
  ``min_lr`` over the remaining epochs. The reference applies it per
  iteration with ``epoch = data_iter_step / steps_per_epoch + epoch_idx``.
- ``linear_ramp`` (lr_sched.py:21-25) and ``power_decay`` (lr_sched.py:28-30)
  are shipped-but-unused helpers; kept for capability parity.

These are plain float math (also jnp-traceable: they accept jnp scalars) so
the same function drives both the host-side logging value and the schedule
baked into the jitted train step.
"""

from __future__ import annotations

import math
from typing import Any, Dict


def cosine_warmup_lr(epoch, config: Dict[str, Any]):
    """Half-cycle cosine decay with linear warmup.

    ``epoch`` may be a Python float or a traced jnp scalar; ``config`` needs
    keys ``lr``, ``min_lr``, ``warmup_epochs``, ``epochs``.
    """
    lr = config["lr"]
    min_lr = config["min_lr"]
    warmup = config["warmup_epochs"]
    total = config["epochs"]
    try:
        import jax.numpy as jnp

        is_traced = not isinstance(epoch, (int, float))
    except Exception:  # pragma: no cover - jax always present in practice
        is_traced = False
    if is_traced:
        import jax.numpy as jnp

        warm = lr * epoch / max(warmup, 1e-12)
        decay = min_lr + (lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * (epoch - warmup) / (total - warmup))
        )
        return jnp.where(epoch < warmup, warm, decay)
    if epoch < warmup:
        return lr * epoch / warmup
    return min_lr + (lr - min_lr) * 0.5 * (
        1.0 + math.cos(math.pi * (epoch - warmup) / (total - warmup))
    )


def linear_ramp(epoch, total_epochs, sleep_epochs=0, initial=0.0, final=1.0):
    if epoch < sleep_epochs:
        return initial
    return min(final, final * (epoch - sleep_epochs) / (total_epochs - sleep_epochs))


def power_decay(epoch, total_epochs, power=2.5, initial=1.0, final=0.0):
    decay = (1 - epoch / total_epochs) ** power
    return final + (initial - final) * decay
