"""Worker process for tests/test_multiprocess.py.

Each worker is one JAX *process* of a 2-process, 8-device CPU cluster
(4 local devices each) — the CPU analogue of the reference's multi-node
NCCL setup (src/utils/misc.py:209-233). The parent test computes golden
single-process results; workers re-run the multi-process code paths
(`_host_shard_args`, `shard_batch`, `evaluate`, `_allgather_rows`,
rank-0 checkpointing) and rank 0 compares bitwise.

Invoked as: python mp_worker.py <process_id> <coordinator_port> <workdir>
"""

import os
import pickle
import sys


def train_parity_run(config, mesh, host_batches):
    """3 jitted `base` train steps from a seed-0 init; returns per-step
    losses + the first param leaf. Run identically single- and
    multi-process, the outputs must agree: same global mesh, same GSPMD
    program, so gradient all-reduce and cross-replica BN stats must
    reproduce the single-process math."""
    import jax
    import numpy as np

    from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import shard_batch
    from semi_seg_ecg_tpu.parallel.sharding_rules import shard_state
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, steps_per_epoch=10, model=model)
    state = build_state(config, model, tx, SPEC, seed=0)
    state = shard_state(mesh, state)
    step = jax.jit(make_train_step(model, tx, config, 10))
    losses = []
    for b in host_batches:
        state, metrics = step(state, shard_batch(mesh, b))
        losses.append(float(metrics["loss"]))
    leaf = np.asarray(jax.tree.leaves(state.model.params)[0])
    return losses, leaf


def make_parity_batches(slice_lo=None, slice_hi=None):
    """3 deterministic (16, 1, 256) batches; a process passes its row
    slice, the single-process golden the full range."""
    import numpy as np

    rng = np.random.default_rng(42)
    batches = []
    for _ in range(3):
        b = {"ecg": rng.standard_normal((16, 1, 256)).astype(np.float32),
             "target": rng.integers(0, 4, (16, 256))}
        if slice_lo is not None:
            b = {k: v[slice_lo:slice_hi] for k, v in b.items()}
        batches.append(b)
    return batches


def main() -> None:
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    from jax.experimental import multihost_utils

    from semi_seg_ecg_tpu.algorithms.common import (
        _allgather_rows, _host_shard_args, evaluate, init_model_state,
    )
    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
    from semi_seg_ecg_tpu.data.loader import get_dataloader
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.ops.metrics import build_metric_fn
    from semi_seg_ecg_tpu.parallel.dist import is_main_process
    from semi_seg_ecg_tpu.parallel.mesh import (
        data_parallel_size, make_mesh, shard_batch,
    )
    from semi_seg_ecg_tpu.utils import checkpoint as ckpt

    with open(os.path.join(workdir, "config.pkl"), "rb") as f:
        config = pickle.load(f)

    mesh = make_mesh(config)
    num_shards = data_parallel_size(mesh)
    assert num_shards == 8

    # --- 1. loader shards: disjoint across processes, covering the range --
    sa = _host_shard_args(num_shards)
    assert sa["local_shards"] == 4
    mine = np.arange(sa["shard_offset"], sa["shard_offset"] + 4)
    every = multihost_utils.process_allgather(mine).reshape(-1)
    assert sorted(every.tolist()) == list(range(num_shards)), every

    # --- 2. shard_batch assembles the global array from per-host slices ---
    local = np.repeat(mine[:, None].astype(np.float32), 3, axis=1)
    garr = shard_batch(mesh, {"x": local})["x"]
    assert garr.shape == (8, 3)
    total = float(jax.jit(lambda a: a.sum())(garr))
    assert total == float(np.arange(8).sum() * 3), total

    # --- 3. _allgather_rows scatters peers' rows in place -----------------
    rows = np.arange(pid * 5, pid * 5 + 5)
    buf = np.zeros((10, 2))
    buf[rows] = rows[:, None] + np.array([0.25, 0.5])
    _allgather_rows(rows, [buf])
    np.testing.assert_array_equal(
        buf, np.arange(10)[:, None] + np.array([0.25, 0.5]))

    # --- 4. sharded evaluate == single-process golden (bitwise) -----------
    model = build_model_from_config(config, train=False)
    model_state = init_model_state(model, config, config["seed"])
    ds = build_seg_dataset(config["dataset"], split="valid")
    loader = get_dataloader(
        ds, mode="valid", batch_size=config["dataloader"]["batch_size"],
        seed=config["seed"], num_shards=num_shards, num_workers=2,
        rng_salt=2, **sa,
    )
    metric_fn, _ = build_metric_fn(config["metric"])
    valid_stats, metrics, outputs, labels = evaluate(
        model, model_state, loader, metric_fn, mesh,
        config["metric"]["num_classes"], collect_outputs=True,
    )
    if is_main_process():
        golden = np.load(os.path.join(workdir, "golden.npz"))
        assert valid_stats["loss"] == float(golden["loss"]), \
            (valid_stats["loss"], float(golden["loss"]))
        for name, got in metrics.items():
            np.testing.assert_array_equal(got, golden[f"metric_{name}"])
        np.testing.assert_array_equal(outputs, golden["outputs"])
        np.testing.assert_array_equal(labels, golden["labels"])

    # --- 5. checkpoints are written by rank 0 only ------------------------
    assert is_main_process() == (pid == 0)
    path = os.path.join(workdir, "mp-ckpt.ckpt")
    ckpt.save_checkpoint(path, epoch=0, model_state=model_state)
    multihost_utils.sync_global_devices("ckpt-written")
    assert os.path.exists(path)
    payload = ckpt.load_checkpoint(path)
    assert payload["epoch"] == 0

    # --- 5b. device_cache pattern: replicated HBM table + sharded-index
    # gather must assemble the right rows under multi-controller ----------
    from semi_seg_ecg_tpu.parallel.mesh import replicated

    table = jax.device_put(
        np.arange(20, dtype=np.float32)[:, None] * 10.0, replicated(mesh))
    idx = shard_batch(mesh, {"i": (mine * 2).astype(np.int32)})["i"]
    gathered = jax.jit(lambda t, i: t[i].sum())(table, idx)
    assert float(gathered) == float((np.arange(8) * 2 * 10.0).sum())

    # --- 6. 3-step train loop ~= single-process golden --------------------
    # Tolerances are loose on purpose: XLA CPU partitions intra-op work
    # over different thread counts per topology, so fp32 reassociation
    # alone shifts a pure replicated forward by ~1e-4 (verified: identical
    # param/batch checksums, eval-mode forward differs with zero
    # collectives). The bugs this guards against — wrong batch assembly,
    # missing gradient/BN sync — produce O(1) errors, far above this.
    losses, leaf = train_parity_run(
        config, mesh, make_parity_batches(pid * 8, pid * 8 + 8))
    if is_main_process():
        golden = np.load(os.path.join(workdir, "train_golden.npz"))
        np.testing.assert_allclose(losses, golden["losses"], rtol=5e-3)
        # Adam steps are ~lr-sized regardless of gradient magnitude, so a
        # 1e-4 forward wobble can flip the sign of a near-zero element's
        # update: tolerate a few lr (3 steps x lr=1e-3) absolutely
        np.testing.assert_allclose(leaf, golden["leaf"], rtol=0.05,
                                   atol=5e-3)

    # --- 7. seq_parallel across processes: (data=4, seq=2) global mesh,
    # each host contributes whole data rows (full time axis); the halo
    # exchanges + batch assembly must reproduce the DP golden ------------
    config_sp = {**config, "parallel": {"model_parallel": 1,
                                        "seq_parallel": 2}}
    mesh_sp = make_mesh(config_sp)
    assert data_parallel_size(mesh_sp) == 4
    losses_sp, leaf_sp = train_parity_run(
        config_sp, mesh_sp, make_parity_batches(pid * 8, pid * 8 + 8))
    if is_main_process():
        golden = np.load(os.path.join(workdir, "train_golden.npz"))
        np.testing.assert_allclose(losses_sp, golden["losses"], rtol=5e-3)
        np.testing.assert_allclose(leaf_sp, golden["leaf"], rtol=0.05,
                                   atol=5e-3)

    with open(os.path.join(workdir, f"ok{pid}"), "w") as f:
        f.write("ok")
    print(f"WORKER{pid}-OK", flush=True)


if __name__ == "__main__":
    main()
