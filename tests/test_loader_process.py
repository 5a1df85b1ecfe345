"""Process-worker loader pool (``dataloader.worker_type: process``).

The reference's torch DataLoader runs ``num_workers`` forked processes; our
default pool is threads (the pipeline is mostly GIL-releasing numpy/scipy),
but on multi-core hosts whose configs lean on Python-heavy transforms the
fork pool is the production host path. Because every sample draw is a pure
function of ``(seed, epoch, salt, index)``, the two pools must produce
bit-identical batches — that equivalence is the contract pinned here.
"""

import numpy as np
import pytest

from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
from semi_seg_ecg_tpu.data.loader import DataLoader


def _epoch_batches(loader, epoch):
    loader.set_epoch(epoch)
    return list(loader)


def _make(dataset, worker_type, **kw):
    return DataLoader(dataset, batch_size=4, shuffle=True, seed=11,
                      num_shards=2, drop_last=True, num_workers=3,
                      worker_type=worker_type, **kw)


def test_process_pool_bitwise_matches_threads(synth_dataset_cfg):
    cfg = {
        **synth_dataset_cfg,
        "augmentations": [
            {"random_resize_crop": {"target_length": 2500,
                                    "scale_min": 0.5, "scale_max": 2.0}},
            {"RandomApply": {"transform": {"xflip": {}}, "prob": 0.5}},
        ],
        "transforms": [{"standardize": {"axis": [-1, -2]}},
                       {"to_tensor": {"dtype": "float"}}],
    }
    ds = build_seg_dataset(cfg, split="train_labeled")
    threads = _make(ds, "thread")
    procs = _make(ds, "process")
    try:
        for epoch in (0, 1):
            for bt, bp in zip(_epoch_batches(threads, epoch),
                              _epoch_batches(procs, epoch)):
                assert bt.keys() == bp.keys()
                for k in bt:
                    np.testing.assert_array_equal(bt[k], bp[k])
    finally:
        threads.close()
        procs.close()


class _ExplodingDataset:
    def __len__(self):
        return 8

    def get(self, idx, rng=None):
        if idx == 5:
            raise RuntimeError("bad sample 5")
        return {"ecg": np.zeros((1, 16), np.float32)}


@pytest.mark.parametrize("worker_type", ["thread", "process"])
def test_worker_error_propagates(worker_type):
    loader = DataLoader(_ExplodingDataset(), batch_size=4, shuffle=False,
                        num_workers=2, worker_type=worker_type)
    try:
        with pytest.raises(RuntimeError, match="bad sample 5"):
            list(loader)
    finally:
        loader.close()


class _ConstDataset:
    def __init__(self, value):
        self.value = value

    def __len__(self):
        return 8

    def get(self, idx, rng=None):
        return {"x": np.full((2,), self.value, np.float32)}


def test_respawned_worker_rebinds_its_own_pools_dataset():
    """Pool respawns a dead worker by re-forking the parent — the
    replacement must serve ITS pool's dataset, not whichever one was bound
    last (two pools coexist in every semi-supervised run)."""
    import os
    import signal
    import time

    a = DataLoader(_ConstDataset(1.0), batch_size=4, shuffle=False,
                   num_workers=2, worker_type="process", prefetch=1)
    b = DataLoader(_ConstDataset(2.0), batch_size=4, shuffle=False,
                   num_workers=2, worker_type="process", prefetch=1)
    try:
        assert all((batch["x"] == 1.0).all() for batch in a)
        assert all((batch["x"] == 2.0).all() for batch in b)
        # kill one of A's workers; the pool's handler forks a replacement
        os.kill(a._pool._pool[0].pid, signal.SIGKILL)
        deadline = time.time() + 10
        while a._pool._pool[0].pid is None and time.time() < deadline:
            time.sleep(0.05)
        for _ in range(4):  # enough maps to hit the respawned worker
            assert all((batch["x"] == 1.0).all() for batch in a)
    finally:
        a.close()
        b.close()


def test_worker_killed_mid_map_recovers():
    """A worker SIGKILLed while a map is in flight (the OOM-killer case)
    loses its tasks and can leave the pool's shared queues locked; the
    loader must rebuild the pool and re-run the batch, not hang."""
    import os
    import signal
    import time

    class _SlowDataset:
        def __len__(self):
            return 16

        def get(self, idx, rng=None):
            time.sleep(0.05)
            return {"x": np.full((2,), float(idx), np.float32)}

    loader = DataLoader(_SlowDataset(), batch_size=16, shuffle=False,
                        num_workers=2, worker_type="process", prefetch=1)
    try:
        victim = loader._pool._pool[0].pid
        import threading

        def assassin():
            time.sleep(0.15)  # mid-map: 16 samples x 50 ms / 2 workers
            os.kill(victim, signal.SIGKILL)

        t = threading.Thread(target=assassin)
        t.start()
        batches = list(loader)
        t.join()
        assert len(batches) == 1
        np.testing.assert_array_equal(
            batches[0]["x"][:, 0], np.arange(16, dtype=np.float32))
    finally:
        loader.close()


def test_wedged_alive_worker_hits_map_timeout(tmp_path):
    """A worker that wedges WITHOUT dying (e.g. a lock inherited across a
    fork) produces no pid swap — the map_timeout escape hatch must
    rebuild the pool instead of hanging the step loop forever."""
    import time

    sentinel = tmp_path / "already_wedged_once"

    class _WedgeOnce:
        def __len__(self):
            return 8

        def get(self, idx, rng=None):
            if idx == 3 and not sentinel.exists():
                sentinel.write_text("x")
                time.sleep(60)  # far past map_timeout; killed by rebuild
            return {"x": np.full((2,), float(idx), np.float32)}

    loader = DataLoader(_WedgeOnce(), batch_size=8, shuffle=False,
                        num_workers=2, worker_type="process", prefetch=1,
                        map_timeout=1.0)
    try:
        t0 = time.monotonic()
        batches = list(loader)
        assert time.monotonic() - t0 < 30  # rebuilt, not hung
        assert len(batches) == 1
        np.testing.assert_array_equal(
            batches[0]["x"][:, 0], np.arange(8, dtype=np.float32))
    finally:
        loader.close()


def test_invalid_worker_type_raises():
    with pytest.raises(ValueError, match="worker_type"):
        DataLoader(_ConstDataset(0.0), batch_size=2, worker_type="proces")


def test_close_is_idempotent_and_pool_persists_across_epochs():
    class _Tiny:
        def __len__(self):
            return 4

        def get(self, idx, rng=None):
            return {"x": np.full((2,), idx, np.float32)}

    loader = DataLoader(_Tiny(), batch_size=2, shuffle=False,
                        num_workers=2, worker_type="process")
    try:
        _epoch_batches(loader, 0)
        pool_first = loader._pool
        _epoch_batches(loader, 1)
        assert loader._pool is pool_first  # persistent, not per-epoch
    finally:
        loader.close()
        loader.close()  # idempotent
    assert loader._pool is None
