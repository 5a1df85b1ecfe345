"""Dataset + loader behaviour on the synthetic fixture."""

import math

import numpy as np
import pytest

from semi_seg_ecg_tpu.data.dataset import Subset, build_seg_dataset
from semi_seg_ecg_tpu.data.loader import DataLoader, epoch_indices, get_dataloader


def _train_cfg(synth_cfg):
    return {
        **synth_cfg,
        "filter": [
            {"highpass_filter": {"fs": 250, "cutoff": 0.67}},
            {"lowpass_filter": {"fs": 250, "cutoff": 40}},
        ],
        "augmentations": [
            {"random_resize_crop": {"target_length": 2500,
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
        "transforms": [
            {"standardize": {"axis": [-1, -2]}},
            {"to_tensor": {"dtype": "float"}},
        ],
    }


def test_labeled_dataset_shapes(synth_dataset_cfg):
    ds = build_seg_dataset(_train_cfg(synth_dataset_cfg), split="train_labeled")
    sample = ds.get(0, rng=np.random.default_rng(0))
    assert sample["ecg"].shape == (1, 2500)
    assert sample["ecg"].dtype == np.float32
    assert sample["target"].shape == (2500,)
    assert sample["target"].dtype == np.int64
    assert "ecg_aug" in sample  # strong aug configured


def test_unlabeled_dataset_emits_two_views(synth_dataset_cfg):
    ds = build_seg_dataset(_train_cfg(synth_dataset_cfg), split="train_unlabeled")
    sample = ds.get(0, rng=np.random.default_rng(0))
    assert "target" not in sample
    assert sample["ecg"].shape == (1, 2500)
    assert sample["ecg_aug"].shape == (1, 2500)
    assert not np.array_equal(sample["ecg"], sample["ecg_aug"])


def test_eval_split_has_no_augmentation(synth_dataset_cfg):
    ds = build_seg_dataset(_train_cfg(synth_dataset_cfg), split="valid")
    a = ds.get(0, rng=np.random.default_rng(0))
    b = ds.get(0, rng=np.random.default_rng(999))
    np.testing.assert_array_equal(a["ecg"], b["ecg"])
    assert "ecg_aug" not in a


def test_labeled_oversampling(synth_dataset_cfg):
    ds = build_seg_dataset(
        _train_cfg(synth_dataset_cfg), split="train_labeled", num_unlabeled=16
    )
    assert len(ds) == 16  # 8 labeled oversampled to 16 (semi_dataset.py:86-95)


def test_varied_fs_resampling(synth_dataset_cfg_varied_fs):
    cfg = {**synth_dataset_cfg_varied_fs, "transforms": None}
    ds = build_seg_dataset(cfg, split="valid")
    for i in range(len(ds)):
        s = ds.get(i, rng=np.random.default_rng(0))
        assert s["ecg"].shape == (1, 1000)  # 250 Hz * 4 s regardless of source fs
        assert s["target"].shape == (1000,)


def test_dataset_validation_errors(synth_dataset_cfg):
    cfg = dict(synth_dataset_cfg)
    cfg["train_labeled_csv"] = None
    with pytest.raises(AssertionError):
        build_seg_dataset(cfg, split="train_labeled")


def test_epoch_indices_distributed_parity():
    # pad-to-divisible with wraparound, stride sharding
    idx = epoch_indices(10, shuffle=False, seed=0, epoch=0, num_shards=4)
    assert len(idx) == 12
    np.testing.assert_array_equal(idx[:10], np.arange(10))
    np.testing.assert_array_equal(idx[10:], [0, 1])


def test_epoch_indices_shuffle_deterministic():
    a = epoch_indices(100, True, seed=3, epoch=7)
    b = epoch_indices(100, True, seed=3, epoch=7)
    c = epoch_indices(100, True, seed=3, epoch=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


class _ArangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get(self, idx, rng=None):
        return {"x": np.full((3,), idx, dtype=np.float32)}


def test_loader_epoch_length_matches_ddp_math():
    # N=10, 4 shards, per-shard batch 2, drop_last: ceil(10/4)=3 → 1 step
    dl = DataLoader(_ArangeDataset(10), batch_size=2, num_shards=4,
                    drop_last=True)
    assert len(dl) == 1
    dl = DataLoader(_ArangeDataset(10), batch_size=2, num_shards=4,
                    drop_last=False)
    assert len(dl) == math.ceil(math.ceil(10 / 4) / 2)


def test_loader_covers_all_samples_once_single_shard():
    dl = DataLoader(_ArangeDataset(8), batch_size=4, shuffle=True,
                    drop_last=True, num_workers=1, prefetch=1)
    batches = list(dl)
    seen = np.concatenate([b["x"][:, 0] for b in batches])
    assert sorted(seen.tolist()) == list(range(8))


def test_loader_sharded_batches_disjoint():
    dl = DataLoader(_ArangeDataset(16), batch_size=2, num_shards=4,
                    shuffle=True, drop_last=True)
    mat = dl.step_indices()
    assert mat.shape == (2, 4, 2)
    flat = mat.reshape(-1)
    assert sorted(flat.tolist()) == list(range(16))


def test_loader_set_epoch_changes_order():
    dl = DataLoader(_ArangeDataset(16), batch_size=4, shuffle=True,
                    drop_last=True)
    dl.set_epoch(0)
    m0 = dl.step_indices()
    dl.set_epoch(1)
    m1 = dl.step_indices()
    assert not np.array_equal(m0, m1)


def test_loader_eval_wraparound_dedup_plan():
    dl = DataLoader(_ArangeDataset(10), batch_size=4, num_shards=2,
                    drop_last=False)
    mat = dl.step_indices()  # (2 steps?, 2 shards, 4)
    flat = set(mat.reshape(-1).tolist())
    assert flat == set(range(10))  # every sample appears at least once


def test_get_dataloader_defaults(synth_dataset_cfg):
    ds = build_seg_dataset(_train_cfg(synth_dataset_cfg), split="train_labeled")
    dl = get_dataloader(ds, mode="train", batch_size=4, seed=0)
    assert dl.drop_last and dl.shuffle
    dl = get_dataloader(ds, mode="valid", batch_size=4)
    assert not dl.drop_last and not dl.shuffle
    batch = next(iter(dl))
    assert batch["ecg"].shape == (4, 1, 2500)
    assert batch["target"].shape == (4, 2500)


def test_subset(synth_dataset_cfg):
    ds = build_seg_dataset(_train_cfg(synth_dataset_cfg), split="train_unlabeled")
    sub = Subset(ds, [3, 1])
    assert len(sub) == 2
    a = sub.get(0, rng=np.random.default_rng(0))
    b = ds.get(3, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(a["ecg"], b["ecg"])


def test_loader_rng_determinism(synth_dataset_cfg):
    ds = build_seg_dataset(_train_cfg(synth_dataset_cfg), split="train_labeled")
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=5, drop_last=True,
                    num_workers=2)
    b1 = [b["ecg"].copy() for b in dl]
    b2 = [b["ecg"].copy() for b in dl]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    dl.set_epoch(1)
    b3 = [b["ecg"] for b in dl]
    assert not np.array_equal(b1[0], b3[0])
