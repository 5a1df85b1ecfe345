"""Flat fused training state: buffer donation without per-leaf copies.

The donated train step's output tree has ~430 tiny leaves (BatchNorm
scale/bias vectors, 3-tap conv kernels, their Adam moments, EMA/peer
copies). XLA materialises every one into its aliased input buffer with an
async copy pair — the B=64 flagship step carries 1,286 copy-starts,
211 us, 6.9% of device time (NOTES.md round-3 profile). The reference
never sees this cost class because torch mutates parameters in place
(reference src/algorithms/base.py optimizer.step()); the TPU-native
equivalent of "in place" is giving XLA ONE output buffer per dtype to
alias, not ~430.

Scheme: pack every array leaf of the TrainState into one flat 1-D buffer
per dtype (fp32 params/moments/EMA/BN stats into one ~tens-of-MB array,
the int32 step/count scalars into a second). The jitted step unpacks with
static slice+reshape views — free, they fuse into the per-leaf bf16 casts
the forward already performs — runs the unchanged tree computation, and
repacks with one ``jnp.concatenate`` per dtype, whose output XLA writes
straight into the donated input buffer. Pack/unpack are layout ops only —
the arithmetic is untouched, though the fused program is a different XLA
program so fusion choices may reorder reductions in the last ulp
(tests/test_fused_state.py pins equivalence at Adam-amplified tolerance).

The fused representation is invisible outside the step: checkpointing,
eval, and torch interop all go through :meth:`FusedTrainState.unfuse`,
which returns the ordinary :class:`~.train_state.TrainState`.

Eligibility: all state leaves must share one sharding (replicated — pure
DP or single chip). Tensor/sequence-parallel runs shard individual leaves
differently and ZeRO-1 shards the moments over ``data``; a single flat
buffer cannot carry per-leaf shardings, so those runs keep the tree state
(run_training logs the reason).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


class FuseMeta:
    """Static packing plan for one TrainState structure.

    Holds the treedef and, per leaf, its dtype bucket, flat offset, size
    and shape. Compared/hased by identity: one instance lives for the
    whole run and is embedded in :class:`FusedTrainState` as a non-pytree
    field, so jit retraces only if a genuinely new plan object appears.
    """

    def __init__(self, state):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        self.treedef = treedef
        self.entries = []          # per leaf: (dtype_key, offset, size, shape)
        sizes: Dict[str, int] = {}
        for leaf in leaves:
            if not hasattr(leaf, "dtype") or not hasattr(leaf, "shape"):
                raise TypeError(
                    f"non-array leaf {type(leaf)} cannot be packed")
            key = str(np.dtype(leaf.dtype))
            size = int(np.prod(leaf.shape, dtype=np.int64))
            off = sizes.get(key, 0)
            self.entries.append((key, off, size, tuple(leaf.shape)))
            sizes[key] = off + size
        self.buffer_sizes = sizes  # dtype_key -> total length
        self.n_leaves = len(leaves)

    # -- device-side pack / unpack (trace-safe, layout ops only) --------

    def pack(self, state) -> Dict[str, jnp.ndarray]:
        leaves = jax.tree_util.tree_leaves(state)
        assert len(leaves) == self.n_leaves, (
            f"state structure changed: {len(leaves)} leaves vs "
            f"{self.n_leaves} in the packing plan")
        parts: Dict[str, list] = {k: [] for k in self.buffer_sizes}
        for leaf, (key, _off, _size, shape) in zip(leaves, self.entries):
            parts[key].append(jnp.ravel(leaf))
        return {
            k: (v[0] if len(v) == 1 else jnp.concatenate(v))
            for k, v in parts.items()
        }

    def unpack(self, buffers: Dict[str, jnp.ndarray]):
        leaves = [
            jax.lax.slice(buffers[key], (off,), (off + size,)).reshape(shape)
            for key, off, size, shape in self.entries
        ]
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    # -- cached jitted entry points for host-side use -------------------

    @functools.cached_property
    def _jit_pack(self):
        return jax.jit(self.pack)

    @functools.cached_property
    def _jit_unpack(self):
        return jax.jit(self.unpack)

    def summary(self) -> str:
        mb = {k: self.buffer_sizes[k] * np.dtype(k).itemsize / 1e6
              for k in self.buffer_sizes}
        body = ", ".join(f"{k}[{self.buffer_sizes[k]}] {mb[k]:.1f}MB"
                         for k in sorted(mb))
        return f"{self.n_leaves} leaves -> {len(mb)} buffers ({body})"


@flax.struct.dataclass
class FusedTrainState:
    """Packed state: one flat buffer per dtype + the static plan."""

    buffers: Dict[str, jnp.ndarray]
    meta: FuseMeta = flax.struct.field(pytree_node=False)

    def unfuse(self):
        """Back to the ordinary TrainState tree (one jitted dispatch)."""
        return self.meta._jit_unpack(self.buffers)

    # the epoch loop reads ``state.model`` for eval; everything else goes
    # through an explicit unfuse() (checkpointing unfuses once for all
    # branches — see common._save)
    @property
    def model(self):
        return self.unfuse().model

    @property
    def step(self):
        return self.unfuse().step


def fuse_state(state) -> FusedTrainState:
    """Pack a TrainState into flat per-dtype buffers (device-side)."""
    meta = FuseMeta(state)
    return FusedTrainState(buffers=meta._jit_pack(state), meta=meta)


def wrap_step(inner_step, meta: FuseMeta):
    """Lift ``inner_step(TrainState, batch)`` to operate on FusedTrainState.

    Unpack -> unchanged tree computation -> repack; with ``donate_argnums=0``
    the repack concatenates write in place into the donated flat buffers.
    """

    def fused_step(fstate: FusedTrainState, batch):
        state = meta.unpack(fstate.buffers)
        new_state, metrics = inner_step(state, batch)
        return (
            FusedTrainState(buffers=meta.pack(new_state), meta=meta),
            metrics,
        )

    return fused_step


def fused_state_blocker(mesh, shard_optimizer: bool) -> Optional[str]:
    """None when the flat buffer can carry the run's shardings, else the
    human-readable reason it can't (mirrors data.device_cache's
    plan_allows_device_cache contract)."""
    from ..parallel.mesh import MODEL_AXIS, SEQ_AXIS

    shape = dict(mesh.shape)
    if shape.get(MODEL_AXIS, 1) > 1:
        return "tensor parallelism shards individual parameter leaves"
    if shape.get(SEQ_AXIS, 1) > 1:
        return "sequence parallelism shards individual state leaves"
    if shard_optimizer:
        return "ZeRO-1 shards optimizer moments over the data axis"
    return None


def maybe_unfuse(state):
    """TrainState view of either representation (identity for trees)."""
    return state.unfuse() if isinstance(state, FusedTrainState) else state
