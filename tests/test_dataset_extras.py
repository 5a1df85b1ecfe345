"""Dataset config paths not covered elsewhere: train_crop/eval_crop,
latent-without-projection, metric extras."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.data.dataset import build_seg_dataset


def test_train_and_eval_crop_configs(synth_dataset_cfg):
    cfg = {
        **synth_dataset_cfg,
        "train_crop": [{"random_crop": {"crop_length": 1000}}],
        "eval_crop": [{"center_crop": {"crop_length": 1200}}],
        "transforms": [{"to_tensor": {"dtype": "float"}}],
    }
    train_ds = build_seg_dataset(cfg, split="train_labeled")
    s = train_ds.get(0, rng=np.random.default_rng(0))
    assert s["ecg"].shape == (1, 1000)
    assert s["target"].shape == (1000,)
    eval_ds = build_seg_dataset(cfg, split="valid")
    s = eval_ds.get(0, rng=np.random.default_rng(0))
    assert s["ecg"].shape == (1, 1200)
    # eval crop is deterministic center crop
    s2 = eval_ds.get(0, rng=np.random.default_rng(42))
    np.testing.assert_array_equal(s["ecg"], s2["ecg"])


def test_crop_uses_joint_indices(synth_dataset_cfg):
    cfg = {
        **synth_dataset_cfg,
        "train_crop": [{"random_crop": {"crop_length": 500}}],
        "transforms": [{"to_tensor": {"dtype": "float"}}],
    }
    ds = build_seg_dataset(cfg, split="train_labeled")
    a = ds.get(0, rng=np.random.default_rng(5))
    b = ds.get(0, rng=np.random.default_rng(5))
    np.testing.assert_array_equal(a["ecg"], b["ecg"])
    np.testing.assert_array_equal(a["target"], b["target"])


def test_latent_without_projection():
    """return_latent falls back to the raw embedding when no projection is
    configured (encoder_decoder.py:89-93)."""
    from semi_seg_ecg_tpu.models import build_model_from_config

    cfg = {
        "precision": "fp32",
        "backbone": {"resnet18": {"num_leads": 1, "num_stages": 4,
                                  "out_indices": [0, 1, 2, 3],
                                  "dilations": [1, 1, 1, 1],
                                  "strides": [1, 2, 2, 2],
                                  "deep_stem": False, "avg_down": False,
                                  "contract_dilation": False}},
        "decode_head": {"FCNHead": {"in_channels": 512, "in_index": 3,
                                    "channels": 32, "num_convs": 1,
                                    "concat_input": False,
                                    "dropout_ratio": 0.0, "num_classes": 4,
                                    "align_corners": False}},
    }
    model = build_model_from_config(cfg)
    x = jnp.zeros((1, 1, 512))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False, return_latent=True,
    )
    out = model.apply(variables, x, train=False, return_latent=True)
    assert out["latent"].shape == (1, 512, 512)  # feat_dim channels, T time


def test_cache_disable(synth_dataset_cfg):
    cfg = {**synth_dataset_cfg, "cache": False,
           "transforms": [{"to_tensor": {"dtype": "float"}}]}
    ds = build_seg_dataset(cfg, split="valid")
    assert ds._cache is None
    s = ds.get(0, rng=np.random.default_rng(0))
    assert s["ecg"].shape == (1, 2500)
