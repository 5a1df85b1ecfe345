"""Optimizer-state (ZeRO-1) sharding — ``parallel.shard_optimizer: true``.

Contracts (parallel/sharding_rules.py module docstring):
- Adam moments shard over the ``data`` axis; params / EMA / BN stats stay
  replicated (forward passes read them every step);
- training is numerically unchanged — the sharded weight update computes
  the same numbers the replicated one does;
- the full driver runs with the knob on (checkpoints, eval, resume
  machinery all see sharded opt state);
- the step's *output* state keeps the moment sharding (the constraint
  actually pins it — otherwise the partitioner may re-replicate).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.algorithms import base as base_algo
from semi_seg_ecg_tpu.algorithms.common import build_state
from semi_seg_ecg_tpu.models import build_model_from_config
from semi_seg_ecg_tpu.parallel.mesh import (
    DATA_AXIS, batch_sharding, make_mesh,
)
from semi_seg_ecg_tpu.parallel.sharding_rules import (
    shard_state, state_shardings,
)
from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

from tests.test_algorithms_e2e import make_config

SMALL_CFG = {
    "backbone": {"resnet18": {
        "num_leads": 1, "num_stages": 4, "out_indices": [0, 1, 2, 3],
        "dilations": [1, 1, 1, 1], "strides": [1, 2, 2, 2],
        "deep_stem": False, "avg_down": False, "contract_dilation": False,
    }},
    "decode_head": {"FCNHead": {
        "in_channels": 512, "in_index": 3, "channels": 16, "num_convs": 1,
        "concat_input": False, "dropout_ratio": 0.1, "num_classes": 4,
        "align_corners": False,
    }},
    "dataset": {"signal_length": 256},
    "train": {"epochs": 1, "warmup_epochs": 0, "lr": 1e-3, "blr": None,
              "min_lr": 1e-4, "weight_decay": 0.05, "max_norm": None,
              "layer_decay": None, "optimizer": "adamw",
              "optimizer_kwargs": {"betas": [0.9, 0.999]},
              "eff_batch_size": 16},
    "seed": 0,
}


def _built(mesh, shard_optimizer):
    model = build_model_from_config(SMALL_CFG, train=True)
    tx = build_optimizer(SMALL_CFG, None, 10, model=model)
    state = build_state(SMALL_CFG, model, tx, base_algo.SPEC, seed=0)
    return model, tx, shard_state(mesh, state,
                                  shard_optimizer=shard_optimizer)


def _spec_names(leaf):
    return {ax for entry in leaf.sharding.spec for ax in
            (entry if isinstance(entry, tuple) else (entry,)) if ax}


def test_moments_shard_params_replicate():
    mesh = make_mesh()
    _, _, state = _built(mesh, shard_optimizer=True)
    moment_leaves = [l for l in jax.tree.leaves(state.opt_state)
                     if hasattr(l, "sharding") and l.ndim >= 1]
    sharded = [l for l in moment_leaves if DATA_AXIS in _spec_names(l)]
    # the bulk of the moments (conv kernels etc.) must actually shard
    assert sum(l.size for l in sharded) > 0.9 * sum(
        l.size for l in moment_leaves)
    for l in jax.tree.leaves(state.model):
        assert DATA_AXIS not in _spec_names(l)


def test_per_device_optimizer_bytes_drop_by_dp():
    """The point of ZeRO-1: per-device optimizer residency falls ~N×
    (measured here: 30.95 → 3.87 MB on the 8-way mesh for ResNet18)."""
    mesh = make_mesh()
    dp = mesh.shape[DATA_AXIS]

    def per_device_bytes(tree):
        total = 0
        for l in jax.tree.leaves(tree):
            if hasattr(l, "addressable_shards"):
                s = l.addressable_shards[0].data
                total += s.size * s.dtype.itemsize
        return total

    _, _, replicated = _built(mesh, shard_optimizer=False)
    _, _, sharded = _built(mesh, shard_optimizer=True)
    rep = per_device_bytes(replicated.opt_state)
    z1 = per_device_bytes(sharded.opt_state)
    assert z1 <= rep / dp * 1.15, (rep, z1)  # ~N×, small replicated tail
    # params stay fully resident everywhere
    assert per_device_bytes(sharded.model) == per_device_bytes(
        replicated.model)


def test_sharded_update_matches_replicated():
    """Same batches, same init, fp32: ZeRO-1 computes the replicated run's
    numbers. The gradient reduction becomes a reduce-scatter, which
    reorders additions by last-bit epsilons that Adam's
    normalized-by-sqrt(nu) update then amplifies per-parameter (measured:
    3e-5 after one step, growing chaotically after); the honest invariants
    are the one-step update (tight tolerance) and the loss trajectory —
    which tracks the aggregate state — over several steps."""
    cfg = {**SMALL_CFG, "precision": "fp32"}
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    n = 2 * mesh.shape[DATA_AXIS]
    batches = [
        {"ecg": rng.standard_normal((n, 1, 256)).astype(np.float32),
         "target": rng.integers(0, 4, (n, 256))}
        for _ in range(3)
    ]

    def run(zero1):
        model = build_model_from_config(cfg, train=True)
        tx = build_optimizer(cfg, None, 10, model=model)
        state = shard_state(
            mesh, build_state(cfg, model, tx, base_algo.SPEC, seed=0),
            shard_optimizer=zero1)
        step = base_algo.make_train_step(model, tx, cfg, 10)
        if zero1:
            shardings = state_shardings(mesh, state, shard_optimizer=True)

            def step(s, b, _inner=step, _sh=shardings):
                ns, m = _inner(s, b)
                return jax.lax.with_sharding_constraint(ns, _sh), m

        jitted = jax.jit(step, donate_argnums=0)
        losses, snap1 = [], None
        for i, b in enumerate(batches):
            state, metrics = jitted(
                state, jax.device_put(b, batch_sharding(mesh)))
            losses.append(float(metrics["loss"]))
            if i == 0:
                snap1 = jax.device_get(state.model.params)
        return snap1, losses

    params_rep, losses_rep = run(False)
    params_z1, losses_z1 = run(True)
    for la, lb in zip(jax.tree.leaves(params_rep),
                      jax.tree.leaves(params_z1)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=5e-4)
    np.testing.assert_allclose(losses_rep, losses_z1, rtol=1e-4)


def test_output_state_keeps_moment_sharding():
    mesh = make_mesh()
    model, tx, state = _built(mesh, shard_optimizer=True)
    shardings = state_shardings(mesh, state, shard_optimizer=True)
    inner = base_algo.make_train_step(model, tx, SMALL_CFG, 10)

    def step(s, b):
        ns, m = inner(s, b)
        return jax.lax.with_sharding_constraint(ns, shardings), m

    rng = np.random.default_rng(1)
    n = 2 * mesh.shape[DATA_AXIS]
    batch = jax.device_put(
        {"ecg": rng.standard_normal((n, 1, 256)).astype(np.float32),
         "target": rng.integers(0, 4, (n, 256))}, batch_sharding(mesh))
    new_state, _ = jax.jit(step, donate_argnums=0)(state, batch)
    sharded = [l for l in jax.tree.leaves(new_state.opt_state)
               if hasattr(l, "sharding") and l.ndim >= 1
               and DATA_AXIS in _spec_names(l)]
    assert sharded, "output opt_state lost its data-axis sharding"


def test_nondivisible_device_count_falls_back_replicated(capsys):
    """data=6 over power-of-two channel dims: jax rejects uneven
    shardings, so NO moment dim is divisible — ZeRO-1 must degrade to a
    correct replicated run with a loud warning, not crash or shard
    silently-zero leaves (found by the n=6 multichip gate, round 5)."""
    mesh = make_mesh(devices=jax.devices()[:6])
    model, tx, state = _built(mesh, shard_optimizer=True)
    assert "no optimizer-state dimension is divisible" in capsys.readouterr().out
    for l in jax.tree.leaves(state.opt_state):
        if hasattr(l, "sharding"):
            assert DATA_AXIS not in _spec_names(l)
    # the step still runs and produces finite numbers on the 6-way mesh
    shardings = state_shardings(mesh, state, shard_optimizer=True)
    inner = base_algo.make_train_step(model, tx, SMALL_CFG, 10)

    def step(s, b):
        ns, m = inner(s, b)
        return jax.lax.with_sharding_constraint(ns, shardings), m

    rng = np.random.default_rng(2)
    batch = jax.device_put(
        {"ecg": rng.standard_normal((12, 1, 256)).astype(np.float32),
         "target": rng.integers(0, 4, (12, 256))}, batch_sharding(mesh))
    _, metrics = jax.jit(step, donate_argnums=0)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    make_mesh()  # restore the full-device current mesh for later tests


def test_e2e_driver_with_shard_optimizer(e2e_data, tmp_path):
    """Full train → eval → checkpoint pass through the driver with the
    knob on (mean_teacher: EMA branch exercises the replicated side)."""
    import os

    from semi_seg_ecg_tpu.algorithms import get_algorithm

    config = make_config(e2e_data, tmp_path, algorithm="mean_teacher",
                         epochs=1, ema_decay=0.9)
    config["parallel"] = {"shard_optimizer": True}
    get_algorithm("mean_teacher").train(config)
    exp = os.path.join(str(tmp_path), "mean_teacher")
    assert os.path.exists(os.path.join(exp, "best-MeanIoU.ckpt"))
