"""On-device fused augmentation (ops/preprocess.py)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.ops.preprocess import (
    build_device_augment,
    make_strong_ops,
    rand_augment_batch,
    random_resize_crop_batch,
    standardize_batch,
)


def test_standardize_batch_per_sample(rng):
    x = jnp.asarray(rng.standard_normal((4, 1, 500)) * 3 + 1)
    out = np.asarray(standardize_batch(x))
    for b in range(4):
        np.testing.assert_allclose(out[b].mean(), 0, atol=1e-6)
        np.testing.assert_allclose(out[b].std(), 1, atol=1e-5)
    zeros = jnp.zeros((2, 1, 100))
    np.testing.assert_array_equal(np.asarray(standardize_batch(zeros)), 0)


def test_random_resize_crop_batch_shapes_and_padding(rng):
    x = jnp.asarray(rng.standard_normal((8, 1, 500)))
    y = jnp.asarray(rng.integers(1, 4, (8, 500)))
    key = jax.random.key(0)
    xo, yo = random_resize_crop_batch(key, x, y, scale_min=0.5, scale_max=2.0)
    assert xo.shape == (8, 1, 500)
    assert yo.shape == (8, 500)
    assert set(np.unique(np.asarray(yo))) <= {0, 1, 2, 3}
    # strongly shrunk samples must contain zero padding
    xo2, yo2 = random_resize_crop_batch(key, x, y, scale_min=0.5,
                                        scale_max=0.5)
    xo2, yo2 = np.asarray(xo2), np.asarray(yo2)
    assert (xo2 == 0).any(axis=(1, 2)).all()
    assert (yo2 == 0).any(axis=1).all()  # padded label region is background
    # upscale-only: no padding anywhere
    xo3, _ = random_resize_crop_batch(key, x, y, scale_min=1.5,
                                      scale_max=2.0)
    assert not (np.asarray(xo3) == 0).all(axis=2).any()


def test_random_resize_crop_preserves_content_scale_1(rng):
    x = jnp.asarray(rng.standard_normal((2, 1, 500)))
    xo, _ = random_resize_crop_batch(jax.random.key(1), x, None,
                                     scale_min=1.0, scale_max=1.0 + 1e-7)
    np.testing.assert_allclose(np.asarray(xo), np.asarray(x), atol=1e-4)


def test_rand_augment_batch_selection(rng):
    x = jnp.asarray(rng.standard_normal((16, 1, 250)))
    ops = make_strong_ops([
        {"AmplitudeScaling": {"sigma": 0.5}},
        {"AdaptivePowerlineNoise": {"fs": 250}},
        {"RandomPartialWhiteNoise": {"amplitude": 1, "ratio": 0.5}},
        {"RandomPartialSineNoise": {"amplitude": 1, "ratio": 0.5}},
    ])
    # prob=0: identity even though ops are selected
    out0 = rand_augment_batch(jax.random.key(0), x, ops, 3, 0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))
    # prob=1: something changes for every sample
    out1 = rand_augment_batch(jax.random.key(0), x, ops, 3, 1.0)
    changed = (np.asarray(out1) != np.asarray(x)).any(axis=(1, 2))
    assert changed.all()


def test_make_strong_ops_unsupported_raises():
    with pytest.raises(ValueError, match="does not support"):
        make_strong_ops([{"Cutout": {"mask_ratio": 0.3}}])


def test_build_device_augment_contract(rng):
    ds_cfg = {
        "augmentations": [
            {"random_resize_crop": {"target_length": 500,
                                    "scale_min": 0.5, "scale_max": 2.0}},
        ],
        "strong_augmentations": [
            {"RandAugment": {
                "ops": [
                    {"AmplitudeScaling": {"sigma": 0.5}},
                    {"AdaptivePowerlineNoise": {"fs": 250}},
                ],
                "level": 10, "num_layers": 2, "prob": 0.5,
            }},
        ],
    }
    aug = build_device_augment(ds_cfg)
    batch = {
        "ecg": jnp.asarray(rng.standard_normal((4, 1, 500))),
        "target": jnp.asarray(rng.integers(0, 4, (4, 500))),
        "ecg_u_w": jnp.asarray(rng.standard_normal((4, 1, 500))),
    }
    out = jax.jit(aug)(jax.random.key(0), batch)
    assert set(out) >= {"ecg", "target", "ecg_u_w", "ecg_u_s"}
    for k in ("ecg", "ecg_u_w", "ecg_u_s"):
        arr = np.asarray(out[k])
        assert arr.shape == (4, 1, 500)
        # standardized
        np.testing.assert_allclose(arr.reshape(4, -1).std(axis=1), 1,
                                   atol=0.05)
    with pytest.raises(ValueError):
        build_device_augment({"augmentations": [{"xflip": {}}]})


def test_fixmatch_with_device_augment_e2e(synth_dataset_cfg, tmp_path):
    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from tests.test_algorithms_e2e import make_config

    data_cfg = {
        **synth_dataset_cfg,
        "device_augment": True,
    }
    config = make_config(data_cfg, tmp_path, "fixmatch")
    # make_config re-adds host aug keys; set target_length to fixture length
    config["dataset"]["device_augment"] = True
    config["dataset"]["augmentations"] = [
        {"random_resize_crop": {"target_length": 2500,
                                "scale_min": 0.5, "scale_max": 2.0}},
    ]
    config["dataset"]["strong_augmentations"] = [
        {"RandAugment": {
            "ops": [
                {"AmplitudeScaling": {"sigma": 0.5}},
                {"AdaptivePowerlineNoise": {"fs": 250}},
            ],
            "level": 10, "num_layers": 2, "prob": 0.5,
        }},
    ]
    config["train"]["epochs"] = 1
    algo = get_algorithm("fixmatch")
    algo.train(config)
    exp = os.path.join(config["output_dir"], config["exp_name"])
    with open(os.path.join(exp, "log.txt")) as f:
        line = json.loads(f.readline())
    assert np.isfinite(line["train_loss"])
    assert 0.0 <= line["train_mask_ratio"] <= 1.0
