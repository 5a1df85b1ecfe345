"""Worker process for the 4-process CPU cluster test (VERDICT r2 #5).

Four JAX processes × 2 local devices = the same 8-device global mesh the
rest of the suite uses, but with the >2-host branches actually iterating:
``_allgather_rows``'s scatter-peers loop (common.py:351-371) walks 3 peer
row-sets, ST++ ``prepare_semisup`` ranks reliability from 4 host-local
shards, and ``run_inference`` reassembles its output rows from 4 hosts.
Rank 0 compares everything against the parent's single-process goldens.

Invoked as: python mp_worker4.py <process_id> <coordinator_port> <workdir>
"""

import os
import pickle
import sys


def main() -> None:
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=4,
                               process_id=pid)
    assert jax.process_count() == 4 and jax.device_count() == 8
    assert len(jax.local_devices()) == 2

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    from jax.experimental import multihost_utils

    from semi_seg_ecg_tpu.algorithms.common import (
        _allgather_rows, _host_shard_args, run_inference,
    )
    from semi_seg_ecg_tpu.algorithms.stpp import prepare_semisup
    from semi_seg_ecg_tpu.parallel.dist import is_main_process

    with open(os.path.join(workdir, "config.pkl"), "rb") as f:
        config = pickle.load(f)

    # --- 1. host shard layout: 2 shards per host, disjoint, covering ------
    sa = _host_shard_args(8)
    assert sa["local_shards"] == 2 and sa["shard_offset"] == 2 * pid
    mine = np.arange(sa["shard_offset"], sa["shard_offset"] + 2)
    every = multihost_utils.process_allgather(mine).reshape(-1)
    assert sorted(every.tolist()) == list(range(8)), every

    # --- 2. _allgather_rows: the peer-scatter loop iterates over 3 peers --
    rows = np.arange(pid * 5, pid * 5 + 5)
    buf = np.zeros((20, 2))
    buf2 = np.zeros((20,))
    buf[rows] = rows[:, None] + np.array([0.25, 0.5])
    buf2[rows] = rows * 3.0
    _allgather_rows(rows, [buf, buf2])
    np.testing.assert_array_equal(
        buf, np.arange(20)[:, None] + np.array([0.25, 0.5]))
    np.testing.assert_array_equal(buf2, np.arange(20) * 3.0)

    # --- 3. ST++ reliability ranking across 4 hosts -----------------------
    # fp32 caveat: XLA CPU partitions intra-op work differently for a
    # 2-local-device client than the 8-device golden session, so forward
    # logits differ by ~ulps, near-tied argmaxes flip the odd pixel, and
    # per-sample mIoU moves in ~1e-4..1e-3 quanta (one pixel / union).
    # Assert values match within a few quanta and that any ranking
    # inversion vs the golden order is between near-equal values — a real
    # ranking bug (wrong ids, missing host rows) is O(0.1) off.
    reliable = prepare_semisup(config)
    golden = np.load(os.path.join(workdir, "golden4.npz"))
    vals = golden["reliability"]
    np.testing.assert_allclose(
        vals[np.asarray(reliable)], np.sort(vals)[::-1][:len(reliable)],
        atol=5e-3)
    golden_rank = golden["reliable"].tolist()
    pos = {i: p for p, i in enumerate(golden_rank)}
    for a_pos, a in enumerate(reliable):
        for b in reliable[a_pos + 1:]:
            if a in pos and b in pos and pos[a] > pos[b]:
                assert abs(vals[a] - vals[b]) < 5e-3, (
                    f"real ranking inversion: {a} vs {b} "
                    f"({vals[a]} vs {vals[b]})")
    swapped = set(reliable) ^ set(golden_rank)
    if swapped:
        boundary = vals[golden_rank[-1]]
        assert all(abs(vals[i] - boundary) < 5e-3 for i in swapped), (
            f"non-tie membership change: {swapped}")

    # --- 4. inference output reassembly from 4 hosts ----------------------
    # same fp32 caveat as section 3 — tight allclose, not bitwise: the bugs
    # this guards against (wrong row scatter, missing peer exchange) leave
    # whole rows zero or permuted, far above any reassociation noise
    outputs = run_inference(config)
    assert outputs.shape == golden["outputs"].shape
    np.testing.assert_allclose(outputs, golden["outputs"],
                               rtol=1e-4, atol=5e-3)

    multihost_utils.sync_global_devices("mp4-done")
    if is_main_process():
        assert os.path.exists(os.path.join(
            workdir, config["exp_name"], "test_outputs.npy"))
    with open(os.path.join(workdir, f"ok4_{pid}"), "w") as f:
        f.write("ok")
    print(f"WORKER{pid}-OK", flush=True)


if __name__ == "__main__":
    main()
