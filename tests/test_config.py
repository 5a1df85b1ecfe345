"""Config system: deep merge, CLI precedence, legacy-knob normalisation."""

import os

import yaml

from semi_seg_ecg_tpu.config import (
    deep_merge,
    experiment_dir,
    load_config,
    normalize_config,
    parse_eval_args,
    parse_train_args,
)
from semi_seg_ecg_tpu.config import test_cfg as _test_cfg


def test_deep_merge_nested_and_list_replacement():
    base = {"a": {"b": 1, "c": [1, 2]}, "d": 5}
    override = {"a": {"c": [9]}, "e": 6}
    out = deep_merge(base, override)
    assert out == {"a": {"b": 1, "c": [9]}, "d": 5, "e": 6}


def test_load_config_with_override(tmp_path):
    base = tmp_path / "base.yaml"
    over = tmp_path / "over.yaml"
    base.write_text(yaml.dump({
        "exp_name": "<FILL IN>",
        "dataset": {"ecg_dir": "<FILL IN>", "signal_length": 2500},
    }))
    over.write_text(yaml.dump({
        "exp_name": "ludb/1over16",
        "dataset": {"ecg_dir": "/data/ecg"},
    }))
    cfg = load_config(str(base), str(over))
    assert cfg["exp_name"] == "ludb/1over16"
    assert cfg["dataset"]["ecg_dir"] == "/data/ecg"
    assert cfg["dataset"]["signal_length"] == 2500


def test_parse_train_args_cli_precedence(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.dump({"exp_name": "from_yaml", "output_dir": "/tmp/x",
                               "device": "cuda", "use_amp": True}))
    cfg = parse_train_args([
        "-f", str(base), "--exp_name", "from_cli", "--start_epoch", "3",
    ])
    assert cfg["exp_name"] == "from_cli"
    assert cfg["start_epoch"] == 3
    assert cfg["output_dir"] == "/tmp/x"  # empty CLI value doesn't override


def test_parse_eval_args_model_path_routing(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.dump({"test": {"target_metric": "MeanIoU"}}))
    cfg = parse_eval_args(["-f", str(base), "--model_path", "/ckpt/best.ckpt"])
    assert cfg["test"]["model_path"] == "/ckpt/best.ckpt"
    assert cfg["test"]["target_metric"] == "MeanIoU"
    # boolean test: section (legal — reference checks truthiness only)
    base.write_text(yaml.dump({"test": True}))
    cfg = parse_eval_args(["-f", str(base), "--model_path", "/ckpt/b.ckpt"])
    assert cfg["test"]["model_path"] == "/ckpt/b.ckpt"


def test_normalize_legacy_device_and_amp():
    cfg = normalize_config({"device": "cuda", "use_amp": True})
    assert cfg["device"] is None  # default JAX backend
    assert cfg["precision"] == "bf16"
    cfg = normalize_config({"device": "cpu", "use_amp": False})
    assert cfg["device"] == "cpu"
    assert cfg["precision"] == "fp32"


def test_normalize_reco_typo_alias():
    # reference reads the literal typo key 'eash_conf_thresh'
    # (reco.py:257, configs/base/resnet18/reco.yaml:113)
    cfg = normalize_config({"train": {"eash_conf_thresh": 0.65}})
    assert cfg["train"]["easy_conf_thresh"] == 0.65
    cfg = normalize_config({"train": {"easy_conf_thresh": 0.7}})
    assert cfg["train"]["eash_conf_thresh"] == 0.7


def test_test_cfg_tolerates_boolean_section():
    # the reference treats config['test'] as a truthy flag
    # (src/train.py:87-90), so `test: false` / `test: true` are legal YAML;
    # accessors must not assume a mapping
    assert _test_cfg({"test": False}) == {}
    assert _test_cfg({"test": True}) == {}
    assert _test_cfg({}) == {}
    assert _test_cfg({"test": {"target_metric": "MeanIoU"}}) == {
        "target_metric": "MeanIoU"
    }


def test_experiment_dir():
    assert experiment_dir({"output_dir": "", "exp_name": "x"}) is None
    assert experiment_dir({"output_dir": "/o", "exp_name": "e"}) == os.path.join("/o", "e")
