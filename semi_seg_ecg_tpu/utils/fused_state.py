"""Flat fused training state: buffer donation without per-leaf copies.

The donated train step's output tree has ~430 leaves; XLA materialises
every one into its aliased input buffer with an async copy pair — the
B=64 flagship step carries 1,286 copy-starts, 211 us, 6.9% of device
time, dominated by the TINY leaves (fp32 BatchNorm scale/bias/stat
vectors [64]..[512], 3-tap conv kernels, their Adam moments, EMA copies;
NOTES.md round-3 profile). The reference never sees this cost class
because torch mutates parameters in place (reference
src/algorithms/base.py optimizer.step()); the TPU-native equivalent of
"in place" is giving XLA few output buffers to alias, not ~430.

Scheme — pack the SMALL leaves only: every array leaf of the TrainState
with at most ``max_packed_elems`` elements is packed into one flat 1-D
buffer per dtype; large leaves (the big conv kernels / embeddings that
carry the FLOPs) stay ordinary tree leaves. The jitted step unpacks the
packed leaves with static slice+reshape views, runs the unchanged tree
computation, and repacks with one small ``jnp.concatenate`` per dtype.
Why hybrid, and why the threshold is small (round-4 B=64 hlo_stats
sweep on v5e): packing EVERYTHING is a net loss (the ~20 MB fp32
concatenate alone costs 104 us HBM time and the donated-buffer
read-slices/aliased-write hazard makes XLA protect with copies anyway —
copy-done stayed at 244 us); threshold 8192 still pays an 83 us
concatenate; thresholds 1024 and 4096 measure identically at the
optimum — copy-done 211 -> 151 us, concatenate 1.4 us, device-busy
3065 -> 3018 us (-1.6%). The win is real but bounded: the per-leaf
aliasing copies are latency-bound (~0.16 us each), and only the tiny
BN/bias/3-tap leaves are numerous enough to matter.

The residual 151 us of copy-done is NOT donation copies at all (round-4
HLO audit, NOTES.md): with the hybrid state the donated update aliases
cleanly, and what remains is XLA memory-space-assignment prefetch
stalls — async HBM<->alternate-memory staging of the big backward
activations — which no packing scheme can touch. Do not escalate the
threshold chasing it.

Pack/unpack are layout ops only — the arithmetic is untouched, though
the fused program is a different XLA program so fusion choices may
reorder reductions in the last ulp (tests/test_fused_state.py pins
equivalence at Adam-amplified tolerance).

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
import os
from typing import Any, Dict, List, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# leaves with more elements than this stay ordinary tree leaves: a big
# leaf already amortises its aliasing copy, and packing it just moves
# bytes through an HBM-bound concatenate (swept on v5e: 1024 and 4096
# measure identically, 8192 pays an 83 us concat, 32768 a 104 us one —
# see module docstring). Env override for re-sweeping on new hardware.
MAX_PACKED_ELEMS = int(os.environ.get("ECG_FUSE_MAX_ELEMS", 4096))


class FuseMeta:
    """Static packing plan for one TrainState structure.

    Holds the treedef and, per leaf, whether it is packed (dtype bucket,
    flat offset, size, shape) or passed through. Compared/hashed by
    identity: one instance lives for the whole run and is embedded in
    :class:`FusedTrainState` as a non-pytree field, so jit retraces only
    if a genuinely new plan object appears.
    """

    def __init__(self, state, max_packed_elems: int = MAX_PACKED_ELEMS):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        self.treedef = treedef
        # per leaf: ("pack", dtype_key, offset, size, shape) or
        #           ("pass", passthrough_position)
        self.entries: List[Tuple] = []
        sizes: Dict[str, int] = {}
        n_pass = 0
        for leaf in leaves:
            if not hasattr(leaf, "dtype") or not hasattr(leaf, "shape"):
                raise TypeError(
                    f"non-array leaf {type(leaf)} cannot be packed")
            size = int(np.prod(leaf.shape, dtype=np.int64))
            if size > max_packed_elems:
                self.entries.append(("pass", n_pass))
                n_pass += 1
                continue
            key = str(np.dtype(leaf.dtype))
            off = sizes.get(key, 0)
            self.entries.append(("pack", key, off, size, tuple(leaf.shape)))
            sizes[key] = off + size
        self.buffer_sizes = sizes  # dtype_key -> total length
        self.n_leaves = len(leaves)
        self.n_passthrough = n_pass

    # -- device-side pack / unpack (trace-safe, layout ops only) --------

    def pack(self, state) -> Tuple[Dict[str, jnp.ndarray], List]:
        leaves = jax.tree_util.tree_leaves(state)
        assert len(leaves) == self.n_leaves, (
            f"state structure changed: {len(leaves)} leaves vs "
            f"{self.n_leaves} in the packing plan")
        parts: Dict[str, list] = {k: [] for k in self.buffer_sizes}
        passthrough: List = [None] * self.n_passthrough
        for leaf, entry in zip(leaves, self.entries):
            if entry[0] == "pass":
                passthrough[entry[1]] = leaf
            else:
                parts[entry[1]].append(jnp.ravel(leaf))
        buffers = {
            k: (v[0] if len(v) == 1 else jnp.concatenate(v))
            for k, v in parts.items()
        }
        return buffers, passthrough

    def unpack(self, buffers: Dict[str, jnp.ndarray], passthrough: List):
        leaves = []
        for entry in self.entries:
            if entry[0] == "pass":
                leaves.append(passthrough[entry[1]])
            else:
                _, key, off, size, shape = entry
                leaves.append(
                    jax.lax.slice(buffers[key], (off,),
                                  (off + size,)).reshape(shape))
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
        n_packed = self.n_leaves - self.n_passthrough
        return (f"{n_packed}/{self.n_leaves} leaves -> {len(mb)} buffers "
                f"({body}); {self.n_passthrough} large leaves left native")


@flax.struct.dataclass
class FusedTrainState:
    """Packed state: flat per-dtype buffers for the small leaves, native
    arrays for the large ones, plus the static plan."""

    buffers: Dict[str, jnp.ndarray]
    passthrough: List[Any]
    meta: FuseMeta = flax.struct.field(pytree_node=False)

    def unfuse(self):
        """Back to the ordinary TrainState tree (one jitted dispatch)."""
        return self.meta._jit_unpack(self.buffers, self.passthrough)

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
    """Pack a TrainState into the fused representation (device-side)."""
    meta = FuseMeta(state)
    buffers, passthrough = meta._jit_pack(state)
    return FusedTrainState(buffers=buffers, passthrough=passthrough,
                           meta=meta)


def wrap_step(inner_step, meta: FuseMeta):
    """Lift ``inner_step(TrainState, batch)`` to operate on FusedTrainState.

    Unpack -> unchanged tree computation -> repack; with ``donate_argnums=0``
    the repacked buffers and the untouched-large-leaf updates write in
    place into the donated inputs.
    """

    def fused_step(fstate: FusedTrainState, batch):
        state = meta.unpack(fstate.buffers, fstate.passthrough)
        new_state, metrics = inner_step(state, batch)
        buffers, passthrough = meta.pack(new_state)
        return (
            FusedTrainState(buffers=buffers, passthrough=passthrough,
                            meta=meta),
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
