"""Mesh/parallel semantics: sharded-vs-single equivalence (the SyncBN +
gradient-allreduce guarantees DDP provides in the reference, SURVEY §2 ⑬)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_size,
    make_mesh,
    replicated,
    seq_parallel_size,
    shard_batch,
)


def _tiny_config():
    return {
        "seed": 0,
        "precision": "fp32",
        "mode": "scratch",
        "backbone": {
            "resnet18": {"num_leads": 1, "num_stages": 4,
                         "out_indices": [0, 1, 2, 3],
                         "dilations": [1, 1, 1, 1], "strides": [1, 2, 2, 2],
                         "deep_stem": False, "avg_down": False,
                         "contract_dilation": False}
        },
        "decode_head": {
            "FCNHead": {"in_channels": 512, "in_index": 3, "channels": 16,
                        "num_convs": 1, "concat_input": False,
                        "dropout_ratio": 0.0, "num_classes": 4,
                        "align_corners": False}
        },
        "dataset": {"signal_length": 256},
        "dataloader": {"batch_size": 1},
        "train": {"epochs": 10, "accum_iter": 1, "warmup_epochs": 1,
                  "min_lr": 1e-4, "blr": None, "lr": 1e-3,
                  "weight_decay": 0.05, "max_norm": None, "layer_decay": None,
                  "optimizer": "adamw",
                  "optimizer_kwargs": {"betas": [0.9, 0.999]}},
        "metric": {"task": "segmentation", "num_classes": 4,
                   "target_metrics": ["MeanIoU"]},
        "parallel": {"model_parallel": 1},
    }


def _setup(devices):
    from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    config = _tiny_config()
    mesh = make_mesh(config, devices=devices)
    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, 10, model=model)
    state = build_state(config, model, tx, SPEC, seed=0)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, tx, config, 10))
    return mesh, state, step


def test_mesh_shapes():
    mesh = make_mesh(devices=jax.devices())
    assert data_parallel_size(mesh) == len(jax.devices())
    assert seq_parallel_size(mesh) == 1
    mesh2 = make_mesh({"parallel": {"model_parallel": 2}},
                      devices=jax.devices())
    assert mesh2.shape["model"] == 2
    assert data_parallel_size(mesh2) == len(jax.devices()) // 2
    mesh3 = make_mesh({"parallel": {"seq_parallel": 2}},
                      devices=jax.devices())
    assert seq_parallel_size(mesh3) == 2
    assert data_parallel_size(mesh3) == len(jax.devices()) // 2


def test_sharded_step_equals_single_device_step(rng):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    global_batch = 8
    t = 256
    batch = {
        "ecg": rng.standard_normal((global_batch, 1, t)).astype(np.float32),
        "target": rng.integers(0, 4, (global_batch, t)),
    }

    mesh8, state8, step8 = _setup(jax.devices()[:8])
    out8_state, out8_m = step8(state8, shard_batch(mesh8, batch))

    mesh1, state1, step1 = _setup(jax.devices()[:1])
    out1_state, out1_m = step1(state1, shard_batch(mesh1, batch))

    # same loss and same updated params regardless of sharding:
    # GSPMD mean over the sharded batch == DDP gradient all-reduce + SyncBN
    np.testing.assert_allclose(float(out8_m["loss"]), float(out1_m["loss"]),
                               rtol=1e-5)
    l8 = jax.tree.leaves(out8_state.model.params)
    l1 = jax.tree.leaves(out1_state.model.params)
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
    # BN batch stats also match → cross-replica stat sync holds
    s8 = jax.tree.leaves(out8_state.model.batch_stats)
    s1 = jax.tree.leaves(out1_state.model.batch_stats)
    for a, b in zip(s8, s1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def _vit_config():
    cfg = _tiny_config()
    cfg["backbone"] = {
        "vit_tiny": {"seq_len": 256, "patch_size": 16, "num_leads": 1,
                     "fp16_enabled": True, "heads": 2, "dim_head": 32}
    }
    cfg["decode_head"]["FCNHead"]["in_channels"] = 192
    cfg["parallel"] = {"model_parallel": 2}
    return cfg


def test_tensor_parallel_vit_step_matches_dp(rng):
    """(data=4, model=2) mesh with Megatron-style ViT sharding reproduces the
    single-device update."""
    from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.sharding_rules import (
        shard_state, state_shardings,
    )
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    global_batch = 8
    t = 256
    batch = {
        "ecg": rng.standard_normal((global_batch, 1, t)).astype(np.float32),
        "target": rng.integers(0, 4, (global_batch, t)),
    }

    def run(cfg, devices, tp):
        mesh = make_mesh(cfg, devices=devices)
        model = build_model_from_config(cfg, train=True)
        tx = build_optimizer(cfg, None, 10, model=model)
        state = build_state(cfg, model, tx, SPEC, seed=0)
        state = shard_state(mesh, state) if tp else jax.device_put(
            state, replicated(mesh))
        step = jax.jit(make_train_step(model, tx, cfg, 10))
        new_state, m = step(state, shard_batch(mesh, batch))
        return new_state, m, mesh

    cfg_tp = _vit_config()
    st_tp, m_tp, mesh_tp = run(cfg_tp, jax.devices()[:8], tp=True)
    # some QKV kernels must actually be sharded over the model axis
    sharded = [
        s for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding, st_tp.model.params)
        )
        if "model" in str(s.spec)
    ]
    assert sharded, "TP rules produced no sharded parameters"

    cfg_dp = _vit_config()
    cfg_dp["parallel"] = {"model_parallel": 1}
    st_dp, m_dp, _ = run(cfg_dp, jax.devices()[:1], tp=False)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st_tp.model.params),
                    jax.tree.leaves(st_dp.model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)


def test_seq_parallel_step_equals_single_device(rng):
    """(data=4, seq=2) mesh: sharding the *time* axis spatially partitions
    the 1-D convolutions (GSPMD halo exchange) and must reproduce the
    single-device update — the capability that makes Holter-scale records
    (T >> 10^5) trainable at all, since batch sharding cannot cut the
    per-sample activation footprint."""
    global_batch = 8
    t = 256
    batch = {
        "ecg": rng.standard_normal((global_batch, 1, t)).astype(np.float32),
        "target": rng.integers(0, 4, (global_batch, t)),
    }

    cfg_sp = _tiny_config()
    cfg_sp["parallel"] = {"model_parallel": 1, "seq_parallel": 2}
    from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    mesh = make_mesh(cfg_sp, devices=jax.devices()[:8])
    model = build_model_from_config(cfg_sp, train=True)
    tx = build_optimizer(cfg_sp, None, 10, model=model)
    state = jax.device_put(build_state(cfg_sp, model, tx, SPEC, seed=0),
                           replicated(mesh))
    step = jax.jit(make_train_step(model, tx, cfg_sp, 10))
    sb = shard_batch(mesh, batch)
    # the time axis really is sharded over `seq`
    assert sb["ecg"].sharding.spec == jax.sharding.PartitionSpec(
        "data", None, "seq")
    assert sb["target"].sharding.spec == jax.sharding.PartitionSpec(
        "data", "seq")
    # the convs are spatially partitioned (halo exchange), not all-gathered
    hlo = step.lower(state, sb).compile().as_text()
    assert "collective-permute" in hlo, (
        "seq-sharded step compiled without halo exchanges — GSPMD is "
        "gathering the time axis instead of partitioning the convs")

    sp_state, sp_m = step(state, sb)

    mesh1, state1, step1 = _setup(jax.devices()[:1])
    out1_state, out1_m = step1(state1, shard_batch(mesh1, batch))
    np.testing.assert_allclose(float(sp_m["loss"]), float(out1_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sp_state.model.params),
                    jax.tree.leaves(out1_state.model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
    # BN stats reduce over (batch, time): both axes sharded, still synced
    for a, b in zip(jax.tree.leaves(sp_state.model.batch_stats),
                    jax.tree.leaves(out1_state.model.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_seq_sharding_specs_per_array():
    """Per-array spec resolution: time axes shard on `seq` only when they
    divide; 1-D id arrays and ragged trailing dims stay seq-replicated."""
    mesh = make_mesh({"parallel": {"seq_parallel": 2}},
                     devices=jax.devices()[:8])
    P = jax.sharding.PartitionSpec
    batch = {
        "ecg": np.zeros((8, 1, 256), np.float32),     # (B, C, T)
        "target": np.zeros((8, 256), np.int32),       # (B, T)
        "id": np.zeros((8,), np.int32),               # (B,)
        "ragged": np.zeros((8, 255), np.float32),     # T % seq != 0
    }
    sb = shard_batch(mesh, batch)
    assert sb["ecg"].sharding.spec == P("data", None, "seq")
    assert sb["target"].sharding.spec == P("data", "seq")
    assert sb["id"].sharding.spec == P("data")
    assert sb["ragged"].sharding.spec == P("data")


def test_batch_sharding_layout():
    mesh = make_mesh(devices=jax.devices()[:8])
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = shard_batch(mesh, {"x": x})["x"]
    assert arr.sharding.is_equivalent_to(batch_sharding(mesh), arr.ndim)
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_tp_no_match_warns(capsys):
    """model_parallel > 1 with no matching TP rule must warn loudly instead
    of silently running fully replicated (round-1 VERDICT weak item 6)."""
    import jax.numpy as jnp

    from semi_seg_ecg_tpu.parallel.sharding_rules import shard_state
    from semi_seg_ecg_tpu.utils.logging import set_logging_enabled

    mesh = make_mesh({"parallel": {"model_parallel": 2}},
                     devices=jax.devices()[:4])
    set_logging_enabled(True)
    # conv-style params only: no Attention/FeedForward pattern can match
    state = {"backbone": {"conv": {"kernel": jnp.ones((3, 1, 8))}}}
    shard_state(mesh, state)
    assert "no tensor-parallel sharding rule matched" in capsys.readouterr().out

    # ViT-style params: a rule matches, no warning
    state = {"Attention_0": {"Dense_0": {"kernel": jnp.ones((8, 8))}}}
    shard_state(mesh, state)
    assert "no tensor-parallel" not in capsys.readouterr().out


def test_ragged_time_dim_warns_once(caplog):
    """A long trailing dim that fails ONLY seq-divisibility must warn
    (once): the user asked for seq_parallel, the array silently keeping
    the full per-sample footprint defeats the knob (ADVICE r3)."""
    import logging

    from semi_seg_ecg_tpu.parallel import mesh as mesh_mod

    mesh = make_mesh({"parallel": {"seq_parallel": 2}},
                     devices=jax.devices()[:8])
    mesh_mod._WARNED_RAGGED.discard(2501)
    batch = {"ecg": np.zeros((8, 1, 2501), np.float32)}
    with caplog.at_level(logging.WARNING,
                         logger="semi_seg_ecg_tpu.parallel.mesh"):
        shard_batch(mesh, batch)
        first = [r for r in caplog.records if "seq-REPLICATED" in r.message]
        assert len(first) == 1, "ragged time dim under seq>1 must warn"
        shard_batch(mesh, batch)
        again = [r for r in caplog.records if "seq-REPLICATED" in r.message]
        assert len(again) == 1, "the warning must fire once, not per step"
    # short feature axes (e.g. (B, 4) stats) must NOT trigger it
    mesh_mod._WARNED_RAGGED.discard(5)
    with caplog.at_level(logging.WARNING,
                         logger="semi_seg_ecg_tpu.parallel.mesh"):
        caplog.clear()
        shard_batch(mesh, {"stats": np.zeros((8, 5), np.float32)})
        assert not [r for r in caplog.records
                    if "seq-REPLICATED" in r.message]


def test_explicit_flash_under_seq_mesh_warns(caplog):
    """attention_impl='flash' combined with a live seq>1 mesh computes the
    kernel redundantly on every seq rank — must warn (ADVICE r3)."""
    import logging

    from semi_seg_ecg_tpu.models.backbones.vision_transformer import Attention

    make_mesh({"parallel": {"seq_parallel": 2}}, devices=jax.devices()[:8])
    try:
        attn = Attention(output_dim=64, heads=2, dim_head=32,
                         attention_impl="flash")
        with caplog.at_level(
                logging.WARNING,
                logger="semi_seg_ecg_tpu.models.backbones.vision_transformer"):
            # fits_vmem holds at this size, so the warning branch is reached
            assert attn._use_flash(1024, train=False) is True
        assert any("redundantly on every seq rank" in r.message
                   for r in caplog.records)
    finally:
        # restore a plain data mesh for later tests in this process
        make_mesh(devices=jax.devices())
