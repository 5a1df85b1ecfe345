"""Dataset config paths not covered elsewhere: train_crop/eval_crop,
latent-without-projection, metric extras."""

import time

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


def test_tiny_dataset_pads_across_many_shards(synth_dataset_cfg):
    """3 samples over 8 shards: padding must wrap the whole list repeatedly
    (single-slice padding left shards empty -> ZeroDivisionError)."""
    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
    from semi_seg_ecg_tpu.data.loader import DataLoader, epoch_indices

    idx = epoch_indices(3, shuffle=False, seed=0, epoch=0, num_shards=8)
    assert len(idx) == 8
    assert set(idx.tolist()) == {0, 1, 2}

    ds = build_seg_dataset(dict(synth_dataset_cfg), split="valid")
    sub_files = ds.filenames[:3]
    ds.filenames = sub_files
    ds.label_filenames = ds.label_filenames[:3]
    loader = DataLoader(ds, batch_size=2, shuffle=False, seed=0,
                        num_shards=8, num_workers=1)
    mat = loader.step_indices()
    batches = list(loader)
    assert len(batches) == len(mat) >= 1
    assert set(mat.reshape(-1).tolist()) == {0, 1, 2}  # full coverage


def test_loader_propagates_pipeline_errors(synth_dataset_cfg):
    """A failing sample must fail the epoch loudly, not silently truncate
    it (the prefetch thread used to swallow the exception)."""
    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
    from semi_seg_ecg_tpu.data.loader import DataLoader

    ds = build_seg_dataset(dict(synth_dataset_cfg), split="valid")

    class Poisoned:
        def __len__(self):
            return len(ds)

        def get(self, idx, rng=None):
            if idx == 3:
                raise RuntimeError("corrupt record")
            return ds.get(idx, rng=rng)

    loader = DataLoader(Poisoned(), batch_size=2, shuffle=False, seed=0,
                        num_shards=1, num_workers=2, prefetch=2)
    with pytest.raises(RuntimeError, match="corrupt record"):
        for _ in loader:
            pass


def test_loader_survives_abandoned_iteration(synth_dataset_cfg):
    """Breaking mid-epoch must release the producer thread; the next epoch
    then runs to completion (a blocked q.put used to leak the thread)."""
    import threading

    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
    from semi_seg_ecg_tpu.data.loader import DataLoader

    ds = build_seg_dataset(dict(synth_dataset_cfg), split="valid")
    loader = DataLoader(ds, batch_size=1, shuffle=False, seed=0,
                        num_shards=1, num_workers=2, prefetch=1)
    before = threading.active_count()
    for it in range(3):
        for step, _ in enumerate(loader):
            break  # abandon immediately
    assert len(list(loader)) == len(loader)  # full epoch still works
    time.sleep(0.5)
    assert threading.active_count() <= before + 2  # no thread pile-up


def test_prefix_cache_dedups_oversampled_records(synth_dataset_cfg):
    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset

    ds = build_seg_dataset(dict(synth_dataset_cfg), split="train_labeled",
                           num_unlabeled=40)
    n_unique = len(set(ds.filenames))
    for i in range(len(ds)):
        ds._load_processed(i)
    assert len(ds._cache) == n_unique  # one prefix entry per record
