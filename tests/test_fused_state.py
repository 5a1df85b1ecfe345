"""Flat fused state (utils/fused_state.py): the packed-buffer step must be
bit-identical to the tree step, invisible to checkpoints, and correct under
the DP mesh — it exists purely to kill the per-leaf donation-aliasing
copies (NOTES.md round-3 profile: 1,286 copy-starts, 6.9% of the B=64
step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from semi_seg_ecg_tpu.utils.fused_state import (
    FuseMeta,
    FusedTrainState,
    fuse_state,
    fused_state_blocker,
    maybe_unfuse,
    wrap_step,
)

from test_parallel import _tiny_config


def _setup(algo="fixmatch", devices=None):
    from semi_seg_ecg_tpu.algorithms import ALGORITHMS
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    config = _tiny_config()
    if algo == "fixmatch":
        config["train"]["conf_thresh"] = 0.6
        config["train"]["lambda_u"] = 1.0
    mod = ALGORITHMS[algo]
    mesh = make_mesh(config, devices=devices or jax.devices()[:1])
    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, 10, model=model)
    state = build_state(config, model, tx, mod.SPEC, seed=0)
    state = jax.device_put(state, replicated(mesh))
    step = mod.make_train_step(model, tx, config, 10)
    return mesh, state, step


def _batch(rng, n=4, t=256, fixmatch=True):
    b = {
        "ecg": rng.standard_normal((n, 1, t)).astype(np.float32),
        "target": rng.integers(0, 4, (n, t)),
    }
    if fixmatch:
        b["ecg_u_w"] = rng.standard_normal((n, 1, t)).astype(np.float32)
        b["ecg_u_s"] = rng.standard_normal((n, 1, t)).astype(np.float32)
    return b


def _fuse(state, meta):
    bufs, passthrough = meta._jit_pack(state)
    return FusedTrainState(buffers=bufs, passthrough=passthrough, meta=meta)


def test_pack_unpack_roundtrip():
    """unpack(pack(state)) is leaf-for-leaf bit-identical, across dtypes
    (fp32 params/stats + int32 step/count) and None branches (ema/peer)."""
    _, state, _ = _setup(algo="base")
    meta = FuseMeta(state)
    fused = _fuse(state, meta)
    back = fused.unfuse()
    orig_leaves = jax.tree_util.tree_leaves(state)
    back_leaves = jax.tree_util.tree_leaves(back)
    assert len(orig_leaves) == len(back_leaves)
    for a, b in zip(orig_leaves, back_leaves):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # both dtype buckets exist (fp32 tree + int32 counters)
    assert set(fused.buffers) == {"float32", "int32"}


def test_fused_step_matches_tree_step(rng):
    """Three fused steps == three tree steps (fp32, same device).

    Pack/unpack are layout ops, but the fused program is a *different* XLA
    program, so fusion choices can reorder reductions in the last ulp —
    which Adam's first-step normaliser amplifies to ~1e-5 relative on
    near-cancelling grads (NOTES.md parity-testing pitfall). Losses must
    agree tightly; params to Adam-amplified tolerance."""
    _, state, inner = _setup()
    tree_step = jax.jit(inner)

    meta = FuseMeta(state)
    fused = _fuse(state, meta)
    fused_step = jax.jit(wrap_step(inner, meta), donate_argnums=0)

    tstate = state
    for i in range(3):
        batch = _batch(np.random.default_rng(i))
        tstate, tm = tree_step(tstate, batch)
        fused, fm = fused_step(fused, batch)
        np.testing.assert_allclose(np.asarray(tm["loss"]),
                                   np.asarray(fm["loss"]),
                                   rtol=1e-6, atol=0)
    back = fused.unfuse()
    for a, b in zip(jax.tree_util.tree_leaves(tstate),
                    jax.tree_util.tree_leaves(back)):
        # atol floors the comparison for near-zero params, where a last-ulp
        # reduction reorder shows up as a large *relative* difference
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_fused_step_on_dp_mesh_matches_tree(rng):
    """8-way DP fused step reproduces the 8-way DP *tree* step (the
    replicated flat buffer carries the GSPMD psum exactly like the tree
    state does). Same-mesh comparison on purpose: comparing against the
    1-device step would change the per-device program enough that ulp-level
    grad noise, Adam-amplified to ~lr on near-cancelling elements (NOTES.md
    parity-testing pitfall), swamps what this test is pinning. Tree-8dev ==
    tree-1dev is test_parallel's job."""
    batch = _batch(rng, n=8)

    mesh8, state8, inner8 = _setup(devices=jax.devices()[:8])
    sharded = shard_batch(mesh8, batch)

    tree_step = jax.jit(inner8)
    tstate, tm = tree_step(state8, sharded)

    meta8 = FuseMeta(state8)
    f8 = _fuse(state8, meta8)
    step8 = jax.jit(wrap_step(inner8, meta8), donate_argnums=0)
    f8, fm = step8(f8, sharded)

    np.testing.assert_allclose(float(fm["loss"]), float(tm["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(f8.unfuse()),
                    jax.tree_util.tree_leaves(tstate)):
        # fused vs tree are different XLA programs over the SAME mesh and
        # psum pattern — same tolerance story as the single-device test
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_hybrid_split_roundtrip():
    """Leaves above max_packed_elems stay native (TPU conv operands keep
    their tiled layouts — packing them was measured as a net loss,
    NOTES.md round-4); the hybrid representation must still roundtrip
    bit-identically and keep the packed buffers small."""
    _, state, _ = _setup(algo="base")
    # force a split: anything over 64 elements passes through
    meta = FuseMeta(state, max_packed_elems=64)
    assert meta.n_passthrough > 0, "split did not trigger"
    assert meta.n_passthrough < meta.n_leaves, "everything passed through"
    bufs, passthrough = meta._jit_pack(state)
    assert len(passthrough) == meta.n_passthrough
    for leaf in passthrough:
        assert int(np.prod(leaf.shape)) > 64
    back = meta._jit_unpack(bufs, passthrough)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(back)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the production threshold keeps every packed buffer small (the point:
    # one cheap concatenate per dtype, not a tens-of-MB relayout)
    prod = FuseMeta(state)
    from semi_seg_ecg_tpu.utils.fused_state import MAX_PACKED_ELEMS
    for key, n in prod.buffer_sizes.items():
        per_leaf_max = MAX_PACKED_ELEMS * np.dtype(key).itemsize
        assert all(e[3] <= MAX_PACKED_ELEMS
                   for e in prod.entries if e[0] == "pack" and e[1] == key)


def test_blocker_matrix():
    cfg = _tiny_config()
    mesh_dp = make_mesh(cfg, devices=jax.devices()[:8])
    assert fused_state_blocker(mesh_dp, shard_optimizer=False) is None
    assert "ZeRO-1" in fused_state_blocker(mesh_dp, shard_optimizer=True)
    mesh_tp = make_mesh({"parallel": {"model_parallel": 2}},
                        devices=jax.devices()[:8])
    assert "tensor" in fused_state_blocker(mesh_tp, shard_optimizer=False)
    mesh_sp = make_mesh({"parallel": {"seq_parallel": 2}},
                        devices=jax.devices()[:8])
    assert "sequence" in fused_state_blocker(mesh_sp, shard_optimizer=False)


def test_state_view_properties(rng):
    """The epoch loop's surface — state.model for eval, maybe_unfuse for
    checkpointing, jnp.copy snapshots — works on the fused representation."""
    _, state, inner = _setup(algo="mean_teacher")
    fused = fuse_state(state)
    # mean_teacher carries an EMA branch; the property view must expose it
    tree = maybe_unfuse(fused)
    assert tree.ema is not None
    mv = fused.model
    for a, b in zip(jax.tree_util.tree_leaves(mv),
                    jax.tree_util.tree_leaves(state.model)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(fused.step) == 0
    # device-side snapshot used by _save: tree_map over the fused pytree
    snap = jax.tree.map(jnp.copy, fused)
    assert isinstance(snap, FusedTrainState)
    for a, b in zip(jax.tree_util.tree_leaves(maybe_unfuse(snap)),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_carries_fused_state(rng):
    """lax.scan over the fused step (the scan_steps dispatch mode) matches
    per-step dispatch (same tolerance story as the tree-vs-fused test:
    different XLA programs may differ in reduction order by an ulp)."""
    _, state, inner = _setup()
    meta = FuseMeta(state)
    fstep = wrap_step(inner, meta)

    f_a = _fuse(state, meta)
    f_b = jax.tree.map(jnp.copy, f_a)

    batches = [_batch(np.random.default_rng(i)) for i in range(3)]
    per_step = jax.jit(fstep)
    for b in batches:
        f_a, _ = per_step(f_a, b)

    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in batches[0]}
    scanned = jax.jit(
        lambda s, bs: jax.lax.scan(lambda c, x: fstep(c, x), s, bs))
    f_b, _ = scanned(f_b, stacked)

    for a, b in zip(jax.tree_util.tree_leaves(f_a.unfuse()),
                    jax.tree_util.tree_leaves(f_b.unfuse())):
        # atol 5e-7: scan body vs per-step dispatch are different XLA
        # programs; a last-ulp reduction reorder Adam-amplifies to ~1e-7
        # absolute on near-zero params (observed 1.1e-7 on 1/448 elements)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-7)
