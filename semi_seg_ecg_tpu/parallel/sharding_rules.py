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

**Optimizer-state sharding** (``parallel.shard_optimizer: true``) is
ZeRO-1 done the GSPMD way (the "automatic cross-replica sharding of
weight update" recipe from the XLA literature): the Adam moments — which
no forward pass ever reads — additionally shard over the ``data`` axis,
and the train step's output state carries a sharding constraint pinning
them there, so XLA partitions the weight update (reduce-scatter the
gradients into the sharded moment update, all-gather the parameter
delta) instead of replicating it. Optimizer memory drops from 2× params
per device to 2×/N, and the update's elementwise FLOPs drop by N, at
all-reduce-equivalent communication cost. Params/EMA/peer stay
replicated — they feed forward passes every step.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from ..utils.treepath import key_path_names

# TrainState branches holding pure optimizer state (never read by any
# forward pass) — the ZeRO-1 sharding targets
_OPT_BRANCHES = ("opt_state", "peer_opt_state")


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


def _add_data_axis(spec: P, shape, mesh: Mesh) -> P:
    """Extend a (possibly TP-)spec with the ``data`` axis on the first
    free, evenly-divisible dim; unchanged when none qualifies (that leaf
    stays replicated over ``data`` — correct, just not sharded)."""
    dp = mesh.shape[DATA_AXIS]
    if dp <= 1:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    for dim, axis in enumerate(entries):
        if axis is None and shape[dim] > 0 and shape[dim] % dp == 0:
            entries[dim] = DATA_AXIS
            return P(*entries)
    return spec


def state_shardings(mesh: Mesh, state, shard_optimizer: bool = False):
    """NamedSharding pytree for a TrainState (params, moments, EMA, peer).

    ``shard_optimizer`` additionally spreads the ``opt_state`` /
    ``peer_opt_state`` leaves over the ``data`` axis (ZeRO-1, module
    docstring)."""

    def leaf_sharding(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        names = _names(path)
        spec = spec_for_path(names, ndim)
        # guard: a spec must not exceed the leaf's rank and sharded dims
        # must divide evenly; otherwise fall back to replication
        if len(spec) > ndim:
            spec = P()
        else:
            for dim, axis in enumerate(spec):
                if axis is not None and \
                        leaf.shape[dim] % mesh.shape[axis] != 0:
                    spec = P()
                    break
        if (shard_optimizer and ndim >= 1 and names
                and names[0] in _OPT_BRANCHES):
            spec = _add_data_axis(spec, leaf.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_state(mesh: Mesh, state, shard_optimizer: bool = False):
    """Place a TrainState on the mesh under the TP rules (replicated
    everywhere the rules don't match), plus ZeRO-1 moment sharding when
    ``shard_optimizer`` is set.

    When a ``model`` axis is requested but no rule matched any parameter
    (e.g. after a module rename breaks the trailing patterns above), the
    guard keeps the run correct-but-replicated — warn loudly instead of
    degrading silently."""
    shardings = state_shardings(mesh, state, shard_optimizer)
    if shard_optimizer and mesh.shape[DATA_AXIS] > 1:
        # ZeRO-1 can only shard dims the data-axis size divides evenly
        # (jax rejects uneven NamedShardings); with e.g. data=6 over
        # power-of-two channel dims NOTHING divides, and the knob silently
        # buying zero memory is exactly the degradation to warn about
        opt_sharded = any(
            DATA_AXIS in {ax for e in s.spec
                          for ax in (e if isinstance(e, tuple) else (e,))}
            for branch in _OPT_BRANCHES
            for s in jax.tree.leaves(
                getattr(shardings, branch, None),
                is_leaf=lambda x: isinstance(x, NamedSharding))
            if isinstance(s, NamedSharding))
        if not opt_sharded:
            from ..utils.logging import log

            log(
                f"WARNING: shard_optimizer (ZeRO-1) requested but no "
                f"optimizer-state dimension is divisible by the data-axis "
                f"size {mesh.shape[DATA_AXIS]} — optimizer state stays "
                "replicated (correct, but no memory saving); use a device "
                "count that divides the model's channel dims (powers of "
                "two)", force=True,
            )
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
