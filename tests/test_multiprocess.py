"""Multi-process (multi-host analogue) paths on a 2-process CPU cluster.

The suite's other tests run one process with 8 virtual devices; everything
guarded by ``jax.process_count() > 1`` — per-host input sharding, global
batch assembly, cross-host eval reassembly, rank-0-only checkpoints — is
exercised here by actually launching two coordinated JAX processes
(``jax.distributed.initialize`` over localhost, 4 CPU devices each).
Parity anchor: the reference's NCCL multi-node init + DDP semantics
(src/utils/misc.py:209-233).
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _mp_config(dataset_cfg) -> dict:
    return {
        "seed": 0,
        "algorithm": "base",
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
                        "dropout_ratio": 0.1, "num_classes": 4,
                        "align_corners": False}
        },
        "dataset": dict(dataset_cfg),
        "dataloader": {"batch_size": 1, "num_workers": 2},
        "metric": {"task": "segmentation", "num_classes": 4,
                   "include_background": True, "per_class": False,
                   "input_format": "one-hot",
                   "target_metrics": ["MeanIoU"]},
        "train": {"epochs": 1, "accum_iter": 1, "warmup_epochs": 0,
                  "min_lr": 1e-4, "blr": None, "lr": 1e-3,
                  "weight_decay": 0.05, "max_norm": None,
                  "layer_decay": None, "optimizer": "adamw",
                  "optimizer_kwargs": {"betas": [0.9, 0.999]}},
    }


def test_two_process_cpu_cluster(e2e_data, tmp_path):
    config = _mp_config(e2e_data)
    with open(tmp_path / "config.pkl", "wb") as f:
        pickle.dump(config, f)

    # golden: the same evaluate() in THIS single-process 8-device session
    from semi_seg_ecg_tpu.algorithms.common import (
        _host_shard_args, evaluate, init_model_state,
    )
    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
    from semi_seg_ecg_tpu.data.loader import get_dataloader
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.ops.metrics import build_metric_fn
    from semi_seg_ecg_tpu.parallel.mesh import data_parallel_size, make_mesh

    mesh = make_mesh(config)
    num_shards = data_parallel_size(mesh)
    assert num_shards == 8, "suite must run with 8 virtual CPU devices"
    model = build_model_from_config(config, train=False)
    model_state = init_model_state(model, config, config["seed"])
    ds = build_seg_dataset(config["dataset"], split="valid")
    loader = get_dataloader(
        ds, mode="valid", batch_size=config["dataloader"]["batch_size"],
        seed=config["seed"], num_shards=num_shards, num_workers=2,
        rng_salt=2, **_host_shard_args(num_shards),
    )
    metric_fn, _ = build_metric_fn(config["metric"])
    valid_stats, metrics, outputs, labels = evaluate(
        model, model_state, loader, metric_fn, mesh,
        config["metric"]["num_classes"], collect_outputs=True,
    )
    np.savez(
        tmp_path / "golden.npz", loss=valid_stats["loss"], outputs=outputs,
        labels=labels,
        **{f"metric_{k}": np.asarray(v) for k, v in metrics.items()},
    )

    # train-loop golden: same 3 steps, single process, same 8-device mesh
    from tests.mp_worker import make_parity_batches, train_parity_run

    losses, leaf = train_parity_run(config, mesh, make_parity_batches())
    np.savez(tmp_path / "train_golden.npz", losses=losses, leaf=leaf)

    # two coordinated processes; strip the parent's platform env (the
    # sitecustomize TPU plugin hangs on JAX_PLATFORMS=cpu in a fresh
    # interpreter — the worker selects its platform via jax.config)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            # generous: two fresh JAX processes each compile a ResNet train
            # step + eval on CPU; under a fully loaded machine (suite
            # runs, TPU relay) 420 s has proven flaky
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER{pid}-OK" in out
    assert os.path.exists(tmp_path / "ok0")
    assert os.path.exists(tmp_path / "ok1")


def test_four_process_cpu_cluster(e2e_data, tmp_path):
    """4 processes × 2 devices: the >2-host branches actually iterate —
    ``_allgather_rows`` scatters 3 peers' rows, ST++ ``prepare_semisup``
    ranks from 4 host-local shards, ``run_inference`` reassembles output
    rows from 4 hosts (VERDICT r2 #5). Rank 0 asserts bitwise parity with
    the single-process goldens computed here first."""
    from semi_seg_ecg_tpu.algorithms.common import init_model_state
    from semi_seg_ecg_tpu.algorithms.stpp import prepare_semisup
    from semi_seg_ecg_tpu.algorithms.common import run_inference
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.utils import checkpoint as ckpt

    config = _mp_config(e2e_data)
    config["output_dir"] = str(tmp_path)
    config["exp_name"] = "stpp_mp4"
    config["train"]["epochs"] = 3  # snapshot epochs [1, 2, 3]
    config["test"] = {"target_metric": "MeanIoU"}
    with open(tmp_path / "config.pkl", "wb") as f:
        pickle.dump(config, f)

    # fabricate the stage-1 snapshots + a best checkpoint (differently
    # seeded inits stand in for the 1/3 / 2/3 / final stage-1 states)
    exp = tmp_path / "stpp_mp4"
    (exp / "stage1").mkdir(parents=True)
    model = build_model_from_config(config, train=False)
    for e in (1, 2, 3):
        state = init_model_state(model, config, seed=50 + e)
        ckpt.save_checkpoint(str(exp / "stage1" / f"checkpoint-{e}.ckpt"),
                             epoch=e - 1, model_state=state)
    ckpt.save_checkpoint(str(exp / "best-MeanIoU.ckpt"), epoch=2,
                         model_state=init_model_state(model, config, seed=53))

    # goldens: same calls, this single-process 8-device session
    golden_reliable, golden_values = prepare_semisup(config,
                                                     return_values=True)
    golden_outputs = run_inference(config)
    np.savez(tmp_path / "golden4.npz",
             reliable=np.asarray(golden_reliable),
             reliability=golden_values, outputs=golden_outputs)

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker4.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER{pid}-OK" in out
    for pid in range(4):
        assert os.path.exists(tmp_path / f"ok4_{pid}")


def test_host_shard_args_divisibility_guard(monkeypatch):
    from semi_seg_ecg_tpu.algorithms import common

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    with pytest.raises(AssertionError, match="divide evenly"):
        common._host_shard_args(8)
