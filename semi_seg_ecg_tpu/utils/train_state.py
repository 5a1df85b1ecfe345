"""Explicit, pytree-structured training state.

The reference's mutable training objects (model / DDP wrapper / optimizer /
GradScaler / EMA copy / peer model, scattered through each algorithm's
``train``) collapse into one immutable pytree that a single jitted
``train_step(state, batch) → (state, metrics)`` threads through the epoch
loop. EMA teachers (mean_teacher.py:138-149 — params *and* buffers) and the
CPS peer (cps.py:95-157) are just extra branches of the same tree, so the
whole multi-model update is one fused XLA program.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class ModelState:
    """Parameters + BatchNorm running stats for one network."""

    params: Any
    batch_stats: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                  # global optimizer step (int32)
    model: ModelState                  # student / model_1
    opt_state: Any
    ema: Optional[ModelState] = None   # Mean-Teacher / ReCo teacher
    peer: Optional[ModelState] = None  # CPS model_2
    peer_opt_state: Any = None


def ema_update(student: ModelState, teacher: ModelState,
               decay: float) -> ModelState:
    """EMA of params *and* batch stats (mean_teacher.py:138-149 parity:
    the reference EMAs buffers too)."""

    def mix(t, s):
        return t * decay + s.astype(t.dtype) * (1.0 - decay)

    return ModelState(
        params=jax.tree.map(mix, teacher.params, student.params),
        batch_stats=jax.tree.map(mix, teacher.batch_stats, student.batch_stats),
    )


def global_norm(tree) -> jnp.ndarray:
    """L2 norm over a gradient pytree (misc.get_grad_norm_ parity)."""
    return optax.global_norm(tree)
