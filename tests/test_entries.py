"""CLI entry points end-to-end (train.py / test.py / inference.py mains)."""

import json
import os

import numpy as np
import pytest
import yaml

import train as train_entry
import test as test_entry
import inference as inference_entry
from semi_seg_ecg_tpu.utils.profiling import ProfileSchedule, device_memory_mb


@pytest.fixture()
def cli_config_files(synth_dataset_cfg, tmp_path):
    base = {
        "seed": 0,
        "output_dir": str(tmp_path / "exps"),
        "exp_name": "<FILL IN>",
        "resume": None,
        "start_epoch": 0,
        "device": "cpu",
        "use_amp": False,
        "algorithm": "base",
        "mode": "scratch",
        "pretrained_backbone": None,
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
        "dataset": {
            "ecg_dir": "<FILL IN>", "label_dir": "<FILL IN>",
            "index_dir": "<FILL IN>",
            "train_labeled_csv": "<FILL IN>", "valid_csv": "<FILL IN>",
            "test_csv": "<FILL IN>",
            "filename_col": "waveform", "label_filename_col": "label",
            "signal_length": 2500,
            "transforms": [{"standardize": {"axis": [-1, -2]}},
                           {"to_tensor": {"dtype": "float"}}],
        },
        "dataloader": {"batch_size": 1, "num_workers": 2,
                       "pin_memory": False},
        "train": {"epochs": 1, "accum_iter": 1, "warmup_epochs": 0,
                  "min_lr": 1e-4, "blr": None, "lr": 1e-3,
                  "weight_decay": 0.05, "max_norm": None,
                  "layer_decay": None, "optimizer": "adamw",
                  "optimizer_kwargs": {"betas": [0.9, 0.999]}},
        "metric": {"task": "segmentation", "compute_on_cpu": True,
                   "sync_on_compute": False, "num_classes": 4,
                   "include_background": True, "per_class": False,
                   "input_format": "one-hot",
                   "target_metrics": ["MeanIoU"]},
        "test": {"target_metric": "MeanIoU"},
        "ddp": {"world_size": 1, "rank": -1, "distributed": False},
    }
    override = {
        "exp_name": "cli_run",
        "dataset": dict(synth_dataset_cfg),
    }
    base_path = tmp_path / "base.yaml"
    over_path = tmp_path / "override.yaml"
    base_path.write_text(yaml.dump(base))
    over_path.write_text(yaml.dump(override))
    return str(base_path), str(over_path), str(tmp_path / "exps" / "cli_run")


def test_train_test_inference_cli(cli_config_files):
    base, override, exp = cli_config_files
    train_entry.main(["-f", base, "-o", override])
    assert os.path.exists(os.path.join(exp, "best-MeanIoU.ckpt"))
    with open(os.path.join(exp, "log.txt")) as f:
        assert len(f.readlines()) == 1

    test_entry.main(["-f", base, "-o", override])
    assert os.path.exists(os.path.join(exp, "test_metrics.csv"))

    inference_entry.main([
        "-f", base, "-o", override,
        "--model_path", os.path.join(exp, "best-MeanIoU.ckpt"),
    ])
    outputs = np.load(os.path.join(exp, "test_outputs.npy"))
    assert outputs.shape[0] == 4  # test split size


def test_profile_schedule(tmp_path):
    sched = ProfileSchedule({"trace_dir": str(tmp_path / "trace"),
                             "start_step": 2, "num_steps": 2})
    for step in range(6):
        sched.step(step)
    sched.close()
    assert sched._done
    # a trace directory was produced
    assert os.path.exists(str(tmp_path / "trace"))


def test_device_memory_stat():
    mem = device_memory_mb()
    assert mem is None or mem >= 0


def test_doctor_cpu_smoke():
    """tools/doctor.py must terminate and emit a machine-readable report
    (its whole contract is 'never hangs')."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "doctor.py"), "--cpu"],
        capture_output=True, text=True, timeout=180, cwd=repo)
    assert out.returncode == 0
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["backend"]["status"] == "up"
    # the native lib is optional (pure-Python wheel); doctor reports it
    # truthfully either way
    from semi_seg_ecg_tpu.data import native

    assert report["libs"]["libecgdata.so"] == native.available()
    assert all(report["vmem_guards"].values())
