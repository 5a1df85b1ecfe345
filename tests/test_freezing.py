"""Backbone freezing: mode=freeze_backbone and frozen_stages parity
(reference base.py:301-303, resnet.py:341-351)."""

import numpy as np

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
from semi_seg_ecg_tpu.algorithms.common import build_state
from semi_seg_ecg_tpu.models import build_model_from_config
from semi_seg_ecg_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from semi_seg_ecg_tpu.utils.optimizer import build_optimizer, frozen_param_mask


def _config(mode="scratch", frozen_stages=-1):
    return {
        "seed": 0, "precision": "fp32", "mode": mode,
        "backbone": {
            "resnet18": {"num_leads": 1, "num_stages": 4,
                         "out_indices": [0, 1, 2, 3],
                         "dilations": [1, 1, 1, 1], "strides": [1, 2, 2, 2],
                         "deep_stem": False, "avg_down": False,
                         "contract_dilation": False,
                         "frozen_stages": frozen_stages}
        },
        "decode_head": {
            "FCNHead": {"in_channels": 512, "in_index": 3, "channels": 16,
                        "num_convs": 1, "concat_input": False,
                        "dropout_ratio": 0.0, "num_classes": 4,
                        "align_corners": False}
        },
        "dataset": {"signal_length": 256},
        "dataloader": {"batch_size": 1},
        "train": {"epochs": 10, "accum_iter": 1, "warmup_epochs": 0,
                  "min_lr": 1e-3, "blr": None, "lr": 1e-3,
                  "weight_decay": 0.05, "max_norm": None, "layer_decay": None,
                  "optimizer": "adamw",
                  "optimizer_kwargs": {"betas": [0.9, 0.999]}},
        "metric": {"task": "segmentation", "num_classes": 4,
                   "target_metrics": ["MeanIoU"]},
        "parallel": {"model_parallel": 1},
    }


def _leaves_by_top(params, top):
    return jax.tree.leaves(params[top])


def test_frozen_param_mask_freeze_backbone():
    config = _config(mode="freeze_backbone")
    model = build_model_from_config(config)
    from semi_seg_ecg_tpu.algorithms.common import init_model_state

    st = init_model_state(model, config, 0)
    mask = frozen_param_mask(st.params, config)
    assert all(jax.tree.leaves(mask["backbone"]))
    assert not any(jax.tree.leaves(mask["decode_head"]))


def test_frozen_param_mask_frozen_stages():
    config = _config(frozen_stages=1)
    model = build_model_from_config(config)
    from semi_seg_ecg_tpu.algorithms.common import init_model_state

    st = init_model_state(model, config, 0)
    mask = frozen_param_mask(st.params, config, backbone_frozen_stages=1)
    bb = mask["backbone"]
    assert all(jax.tree.leaves(bb["stem_0"]))
    assert all(jax.tree.leaves(bb["layer1_block0"]))
    assert not any(jax.tree.leaves(bb["layer2_block0"]))
    assert not any(jax.tree.leaves(mask["decode_head"]))


def test_freeze_backbone_step_keeps_backbone_params(rng):
    config = _config(mode="freeze_backbone")
    mesh = make_mesh(config, devices=jax.devices()[:1])
    model = build_model_from_config(config)
    from semi_seg_ecg_tpu.algorithms.common import init_model_state

    student = init_model_state(model, config, 0)
    tx = build_optimizer(config, student.params, 10, model=model)
    state = build_state(config, model, tx, SPEC, 0, student=student)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, tx, config, 10))
    batch = shard_batch(mesh, {
        "ecg": rng.standard_normal((4, 1, 256)).astype(np.float32),
        "target": rng.integers(0, 4, (4, 256)),
    })
    new_state, _ = step(state, batch)
    for a, b in zip(_leaves_by_top(state.model.params, "backbone"),
                    _leaves_by_top(new_state.model.params, "backbone")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(_leaves_by_top(state.model.params, "decode_head"),
                        _leaves_by_top(new_state.model.params, "decode_head"))
    )
    assert changed


def test_frozen_stages_bn_stats_not_updated(rng):
    config = _config(frozen_stages=4)  # freeze everything incl. stats
    model = build_model_from_config(config)
    x = jnp.asarray(rng.standard_normal((4, 1, 256)), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    _, mutated = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"]["backbone"])
    after = jax.tree.leaves(mutated["batch_stats"]["backbone"])
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
