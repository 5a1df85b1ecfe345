"""Parameter sharding rules for the ``model`` mesh axis (tensor parallelism).

The reference has no tensor parallelism (SURVEY §2 parallelism checklist) —
the ``model`` axis is this framework's forward-looking extension. Rules are
Megatron-style for the transformer backbone:

- attention QKV projection: output features sharded → each model shard owns
  a slice of heads;
- attention output projection: input features sharded (contracted dim), XLA
  inserts the psum;
- MLP: up-projection output sharded, down-projection input sharded;
- everything else (convs, norms, embeddings, heads) replicated.

Rules are applied by *trailing* path patterns, so the same matcher shards
``params``, the Adam ``mu``/``nu`` moments, EMA teachers and CPS peers
consistently. With ``model_parallel: 1`` every spec degenerates to
replicated — the rules are always on, costing nothing in the pure-DP case.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS
from ..utils.treepath import key_path_names


def _names(path) -> Tuple[str, ...]:
    return key_path_names(path)


def spec_for_path(names: Tuple[str, ...], ndim: int) -> P:
    """Trailing-pattern matcher → PartitionSpec."""
    if len(names) >= 2 and ndim >= 1:
        parent, leaf = names[-2], names[-1]
        in_attention = any(n.startswith("Attention") for n in names)
        in_mlp = any(n.startswith("FeedForward") for n in names)
        if in_attention and parent == "Dense_0":  # QKV projection
            if leaf == "kernel":
                return P(None, MODEL_AXIS)
            if leaf == "bias":
                return P(MODEL_AXIS)
        if in_attention and parent == "Dense_1":  # output projection
            if leaf == "kernel":
                return P(MODEL_AXIS, None)
            if leaf == "bias":
                return P()
        if in_mlp and parent == "Dense_0":  # MLP up
            if leaf == "kernel":
                return P(None, MODEL_AXIS)
            if leaf == "bias":
                return P(MODEL_AXIS)
        if in_mlp and parent == "Dense_1":  # MLP down
            if leaf == "kernel":
                return P(MODEL_AXIS, None)
            if leaf == "bias":
                return P()
    return P()


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for a TrainState (params, moments, EMA, peer)."""

    def leaf_sharding(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        spec = spec_for_path(_names(path), ndim)
        # guard: a spec must not exceed the leaf's rank and sharded dims
        # must divide evenly; otherwise fall back to replication
        if len(spec) > ndim:
            return NamedSharding(mesh, P())
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh under the TP rules (replicated
    everywhere the rules don't match).

    When a ``model`` axis is requested but no rule matched any parameter
    (e.g. after a module rename breaks the trailing patterns above), the
    guard keeps the run correct-but-replicated — warn loudly instead of
    degrading silently."""
    shardings = state_shardings(mesh, state)
    if mesh.shape[MODEL_AXIS] > 1:
        matched = any(
            s.spec != P() for s in jax.tree.leaves(
                shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
        )
        if not matched:
            from ..utils.logging import log

            log(
                f"WARNING: model_parallel={mesh.shape[MODEL_AXIS]} but no "
                "tensor-parallel sharding rule matched any parameter — "
                "training proceeds fully replicated on the model axis "
                "(check parallel/sharding_rules.py patterns against the "
                "model's module names)", force=True,
            )
    return jax.device_put(state, shardings)
