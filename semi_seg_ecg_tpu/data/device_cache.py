"""Device-resident dataset cache: the whole raw prefix lives in HBM.

With ``dataset.device_augment`` the host ships the deterministic prefix
(resample + filter, identical every epoch) of each record per step — through
a remote-tunnel or DCN link that H2D transfer dominates the step budget
(NOTES.md "whole-system" numbers). ECG segmentation corpora are small by
accelerator standards (LUDB ≈ 2 MB, PTB-XL ≈ 200 MB at fs=250/f32), so the
TPU-first fix is to upload the *entire* deduplicated prefix once and ship
only ``int32`` row indices per step; the training program gathers rows in
HBM and fuses augmentation on top (``ops/preprocess.py``).

Enable with ``dataset.device_cache: true`` (requires a fully-fused
``device_augment`` plan — any host-side augmentation keeps per-sample
randomness on the host, where caching can't apply). The reference has no
analogue; its loader re-reads and re-filters per epoch
(src/utils/semi_dataset.py:176-243).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import numpy as np

from .dataset import ECGSemiSegDataset, Subset
from .loader import DataLoader
from ..utils.logging import log


class _IndexDataset:
    """Dataset stand-in that yields cache row numbers instead of arrays —
    reuses the DataLoader's sampler/shard/prefetch machinery unchanged."""

    def __init__(self, rowmap: np.ndarray, key: str):
        self.rowmap = rowmap.astype(np.int32)
        self.key = key

    def __len__(self) -> int:
        return len(self.rowmap)

    def get(self, idx: int, rng=None) -> Dict[str, np.ndarray]:
        return {self.key: self.rowmap[idx]}


def _base_and_rowmap(dataset):
    """Resolve Subset views and deduplicate repeated (oversampled) records.

    Returns the base dataset plus ``rowmap`` mapping dataset index -> unique
    record row, so the HBM cache holds each file once even when the labeled
    list is oversampled to the unlabeled length (semi_dataset.py:86-95)."""
    indices = None
    if isinstance(dataset, Subset):
        indices, dataset = np.asarray(dataset.indices), dataset.dataset
    keys = {}
    rowmap = np.empty(len(dataset.filenames), np.int64)
    uniques: List[int] = []
    for i, fname in enumerate(dataset.filenames):
        label = (dataset.label_filenames[i]
                 if dataset.label_filenames is not None else None)
        fs = dataset.fs_list[i] if dataset.fs_list is not None else None
        k = (fname, label, fs)
        if k not in keys:
            keys[k] = len(uniques)
            uniques.append(i)
        rowmap[i] = keys[k]
    if indices is not None:
        rowmap = rowmap[indices]
    return dataset, rowmap, uniques


class DeviceCache:
    """HBM-resident (signals, labels) for the train datasets + the index
    loaders and the in-step gather that replace the host batch path."""

    def __init__(self, arrays: Dict[str, Any], loaders: Dict[str, Any],
                 bytes_uploaded: int):
        self.arrays = arrays          # device arrays, replicated on the mesh
        self.index_loaders = loaders  # replacements for labeled/unlabeled
        self.bytes_uploaded = bytes_uploaded

    @staticmethod
    def build(loaders: Dict[str, Any], mesh) -> "DeviceCache":
        from ..parallel.mesh import replicated

        arrays: Dict[str, Any] = {}
        new_loaders: Dict[str, Any] = {}
        total = 0
        for name, key in (("labeled", "idx"), ("unlabeled", "idx_u")):
            if name not in loaders:
                continue
            src: DataLoader = loaders[name]
            base, rowmap, uniques = _base_and_rowmap(src.dataset)
            xs, ys = [], []
            for i in uniques:
                x, y = base._load_processed(i)
                xs.append(np.asarray(x, np.float32))
                if y is not None:
                    ys.append(np.squeeze(np.asarray(y)).astype(np.int32))
            x_cache = np.stack(xs)
            total += x_cache.nbytes
            arrays[f"x_{key}"] = jax.device_put(x_cache, replicated(mesh))
            if ys:
                y_cache = np.stack(ys)
                total += y_cache.nbytes
                arrays[f"y_{key}"] = jax.device_put(y_cache,
                                                    replicated(mesh))
            new_loaders[name] = DataLoader(
                _IndexDataset(rowmap, key),
                batch_size=src.batch_size, shuffle=src.shuffle,
                seed=src.seed, num_shards=src.num_shards,
                drop_last=src.drop_last, num_workers=1, prefetch=1,
                shard_offset=src.shard_offset,
                local_shards=src.local_shards, rng_salt=src.rng_salt,
            )
            new_loaders[name].set_epoch(src.epoch)
        return DeviceCache(arrays, new_loaders, total)

    def materialize(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """In-jit gather: index batch -> the raw-view batch the (device)
        augmentation stage expects."""
        out: Dict[str, Any] = {}
        if "idx" in batch:
            rows = batch["idx"]
            out["ecg"] = self.arrays["x_idx"][rows]
            if "y_idx" in self.arrays:
                out["target"] = self.arrays["y_idx"][rows]
        if "idx_u" in batch:
            out["ecg_u_w"] = self.arrays["x_idx_u"][batch["idx_u"]]
        return out

    def wrap_step(self, inner_step):
        def cached_step(state, batch, _inner=inner_step):
            return _inner(state, self.materialize(batch))

        return cached_step


def plan_allows_device_cache(config: Dict[str, Any], spec) -> Optional[str]:
    """None when ``device_cache`` can run, else the human-readable reason it
    can't (logged; the run falls back to the streaming host path)."""
    ds_cfg = config["dataset"]
    if not ds_cfg.get("device_augment", False):
        return "requires dataset.device_augment"
    if ds_cfg.get("train_crop"):
        return "train_crop runs on the host (shape-changing)"
    from ..ops.preprocess import plan_device_augment

    plan = plan_device_augment(ds_cfg)
    if plan.augment is None:
        return "augmentation pipeline is host-only"
    if ds_cfg.get("augmentations") \
            and plan.labeled_overrides.get("augmentations", ()) is not None:
        return "weak augmentations fall back to the host"
    if spec.uses_unlabeled and ds_cfg.get("strong_augmentations") \
            and plan.unlabeled_overrides.get("augmentations", ()) is not None:
        return "unlabeled branch falls back to the host"
    return None
