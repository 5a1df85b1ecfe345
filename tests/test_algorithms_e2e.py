"""End-to-end smoke tests: every algorithm trains a few steps on an
8-device virtual CPU mesh, checkpoints, evaluates, and exports artifacts —
the multi-device analogue of running the reference's train.sh/test.sh
(SURVEY §4 plan items (b)/(c))."""

import glob
import json
import os

import numpy as np
import pytest

from semi_seg_ecg_tpu.algorithms import get_algorithm
from semi_seg_ecg_tpu.config import normalize_config
from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset


def make_config(e2e_data, tmp_path, algorithm="base", backbone="resnet18",
                **train_overrides):
    if backbone == "resnet18":
        backbone_cfg = {
            "resnet18": {
                "num_leads": 1, "num_stages": 4,
                "out_indices": [0, 1, 2, 3], "dilations": [1, 1, 1, 1],
                "strides": [1, 2, 2, 2], "deep_stem": False,
                "avg_down": False, "contract_dilation": False,
            }
        }
        head_in = 512
    else:
        backbone_cfg = {
            "vit_tiny": {"seq_len": 500, "patch_size": 25, "num_leads": 1,
                         "fp16_enabled": True}
        }
        head_in = 192
    config = {
        "seed": 0,
        "output_dir": str(tmp_path),
        "exp_name": algorithm,
        "resume": None,
        "start_epoch": 0,
        "device": "cpu",
        "use_amp": False,  # fp32 on CPU
        "algorithm": algorithm,
        "mode": "scratch",
        "pretrained_backbone": None,
        "backbone": backbone_cfg,
        "decode_head": {
            "FCNHead": {
                "in_channels": head_in, "in_index": 3, "channels": 32,
                "num_convs": 1, "concat_input": False, "dropout_ratio": 0.1,
                "num_classes": 4, "align_corners": False,
            }
        },
        "dataset": {
            **e2e_data,
            "filter": [
                {"highpass_filter": {"fs": 250, "cutoff": 0.67}},
                {"lowpass_filter": {"fs": 250, "cutoff": 40}},
            ],
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
            "transforms": [
                {"standardize": {"axis": [-1, -2]}},
                {"to_tensor": {"dtype": "float"}},
            ],
        },
        "dataloader": {"batch_size": 1, "num_workers": 2, "pin_memory": False},
        "train": {
            "epochs": 2, "accum_iter": 1, "warmup_epochs": 1,
            "min_lr": 0.0001, "blr": None, "lr": 0.001,
            "weight_decay": 0.05, "max_norm": None, "layer_decay": None,
            "optimizer": "adamw",
            "optimizer_kwargs": {"betas": [0.9, 0.999]},
            "conf_thresh": 0.5, "ema_decay": 0.9,
            **train_overrides,
        },
        "metric": {
            "task": "segmentation", "num_classes": 4,
            "include_background": True, "per_class": False,
            "input_format": "one-hot", "target_metrics": ["MeanIoU"],
        },
        "test": {"target_metric": "MeanIoU"},
        "ddp": {"world_size": 1, "rank": -1, "distributed": False},
    }
    return normalize_config(config)


def _exp_dir(config):
    return os.path.join(config["output_dir"], config["exp_name"])


def test_base_end_to_end(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "base")
    algo = get_algorithm("base")
    algo.train(config)
    exp = _exp_dir(config)
    assert os.path.exists(os.path.join(exp, "best-loss.ckpt"))
    assert os.path.exists(os.path.join(exp, "best-MeanIoU.ckpt"))
    with open(os.path.join(exp, "log.txt")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 2
    assert {"train_loss", "valid_loss", "MeanIoU", "epoch"} <= set(lines[0])
    metrics = algo.test(config)
    assert os.path.exists(os.path.join(exp, "test_metrics.csv"))
    outputs = np.load(os.path.join(exp, "test_outputs.npy"))
    labels = np.load(os.path.join(exp, "test_labels.npy"))
    assert outputs.shape == (4, 4, 500)
    assert labels.shape == (4, 4, 500)
    np.testing.assert_allclose(outputs.sum(axis=1), 1.0, atol=1e-5)
    assert set(np.unique(labels)) <= {0, 1}
    assert 0.0 <= metrics["MeanIoU"] <= 1.0


def test_base_resume(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "base")
    algo = get_algorithm("base")
    algo.train(config)
    ckpt_path = os.path.join(_exp_dir(config), "best-loss.ckpt")
    config2 = make_config(e2e_data, tmp_path, "base", epochs=3)
    config2["resume"] = ckpt_path
    algo.train(config2)  # resumes at epoch+1, finishes without error
    with open(os.path.join(_exp_dir(config2), "log.txt")) as f:
        lines = [json.loads(l) for l in f]
    # first run wrote 2 epochs; resumed run appends fewer than 3
    assert lines[-1]["epoch"] == 2


def test_fixmatch_end_to_end(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "fixmatch")
    algo = get_algorithm("fixmatch")
    algo.train(config)
    with open(os.path.join(_exp_dir(config), "log.txt")) as f:
        line = json.loads(f.readline())
    assert "train_mask_ratio" in line
    assert "train_loss_u_s" in line
    assert 0.0 <= line["train_mask_ratio"] <= 1.0


def test_mean_teacher_end_to_end(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "mean_teacher")
    algo = get_algorithm("mean_teacher")
    algo.train(config)
    import pickle

    with open(os.path.join(_exp_dir(config), "best-loss.ckpt"), "rb") as f:
        payload = pickle.load(f)
    assert "model_ema" in payload  # teacher saved (mean_teacher.py:378-387)


def test_cps_end_to_end(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "cps")
    algo = get_algorithm("cps")
    algo.train(config)
    import pickle

    with open(os.path.join(_exp_dir(config), "best-loss.ckpt"), "rb") as f:
        payload = pickle.load(f)
    assert "model_peer" in payload


def test_reco_end_to_end(e2e_data, tmp_path):
    config = make_config(
        e2e_data, tmp_path, "reco",
        eash_conf_thresh=0.0, hard_conf_thresh=0.8, contr_temp=0.25,
        contr_num_queries=8, contr_num_negatives=16,
    )
    config["use_latent_projection"] = True
    config["projection_in_dim"] = 512
    config["projection_out_dim"] = 32
    config = normalize_config(config)
    algo = get_algorithm("reco")
    algo.train(config)
    with open(os.path.join(_exp_dir(config), "log.txt")) as f:
        line = json.loads(f.readline())
    assert "train_contr_loss" in line
    assert np.isfinite(line["train_contr_loss"])


def test_stpp_full_pipeline(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "stpp", epochs=3)
    algo = get_algorithm("stpp")
    algo.train(config)
    exp = _exp_dir(config)
    # stage1 snapshots at 1, 2, 3 of 3 epochs
    for e in (1, 2, 3):
        assert os.path.exists(
            os.path.join(exp, "stage1", f"checkpoint-{e}.ckpt")
        )
    assert os.path.exists(os.path.join(exp, "stage2", "best-MeanIoU.ckpt"))
    # stage 3 output lands in the experiment root (stpp.py:544-548)
    assert os.path.exists(os.path.join(exp, "best-MeanIoU.ckpt"))
    algo.test(config)
    assert os.path.exists(os.path.join(exp, "test_metrics.csv"))


def test_inference_entry(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "base")
    get_algorithm("base").train(config)
    from semi_seg_ecg_tpu.algorithms.common import run_inference

    outputs = run_inference(config)
    assert outputs.shape == (4, 4, 500)
    assert os.path.exists(os.path.join(_exp_dir(config), "test_outputs.npy"))


def test_vit_base_end_to_end(e2e_data, tmp_path):
    config = make_config(e2e_data, tmp_path, "base", backbone="vit_tiny")
    get_algorithm("base").train(config)
    assert os.path.exists(os.path.join(_exp_dir(config), "best-loss.ckpt"))


def test_auxiliary_heads_train_e2e(e2e_data, tmp_path):
    """auxiliary_heads params must be created at init (they only trace in
    train mode, encoder_decoder.py:108) and the aux CE must flow into the
    loss — init in eval mode used to skip them and crash the first step."""
    from semi_seg_ecg_tpu.algorithms import get_algorithm

    config = make_config(e2e_data, tmp_path, "base")
    config["auxiliary_heads"] = [{"FCNHead": {
        "in_channels": 256, "in_index": 2, "channels": 16, "num_convs": 1,
        "concat_input": False, "dropout_ratio": 0.0, "num_classes": 4,
        "align_corners": False}}]
    config["train"]["auxiliary_loss_weight"] = [0.4]
    config["train"]["epochs"] = 1
    get_algorithm("base").train(config)
    with open(os.path.join(config["output_dir"], "base", "log.txt")) as f:
        line = json.loads(f.readline())
    assert np.isfinite(line["train_loss"])


def test_stpp_snapshot_epochs_clamped():
    from semi_seg_ecg_tpu.algorithms.stpp import snapshot_epoch_list

    assert snapshot_epoch_list(100) == [33, 66, 100]
    assert snapshot_epoch_list(2) == [1, 1, 2]   # epoch-0 ckpt can't exist
    assert snapshot_epoch_list(1) == [1, 1, 1]
