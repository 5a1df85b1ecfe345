"""Shipped config grid: every base config parses, builds its model and
optimizer, and resolves its algorithm; the reference's own YAML files load
unmodified (drop-in compatibility)."""

import glob
import os

import pytest

from semi_seg_ecg_tpu.algorithms import get_algorithm
from semi_seg_ecg_tpu.config import load_config, normalize_config
from semi_seg_ecg_tpu.models import build_model_from_config
from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs/base/*/*.yaml")))
BENCH_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs/bench/**/*.yaml"),
                                 recursive=True))
REFERENCE_CONFIGS = sorted(glob.glob(
    "/root/reference/configs/base/*/*.yaml"))


@pytest.mark.parametrize("path", BASE_CONFIGS,
                         ids=[os.path.relpath(p, REPO) for p in BASE_CONFIGS])
def test_shipped_base_config_builds(path):
    config = normalize_config(load_config(path))
    algo = get_algorithm(config["algorithm"])
    assert hasattr(algo, "train") and hasattr(algo, "test")
    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, steps_per_epoch=10, model=model)
    assert tx is not None
    assert config["metric"]["target_metrics"] == ["MeanIoU"]
    assert config["dataset"]["signal_length"] == 2500
    if config["algorithm"] in ("mean_teacher", "fixmatch", "reco"):
        assert config["dataset"].get("strong_augmentations"), path
    if config["algorithm"] == "reco":
        assert config.get("use_latent_projection")
        assert config["train"]["easy_conf_thresh"] == 0.65


def test_shipped_grid_is_complete():
    assert len(BASE_CONFIGS) == 12    # 2 backbones × 6 algorithms
    assert len(BENCH_CONFIGS) == 21   # (4+PTB-XL) datasets × 4 ratios + merged


@pytest.mark.parametrize("base", BASE_CONFIGS[:1])
def test_bench_override_merges(base):
    over = os.path.join(REPO, "configs/bench/ludb/1over16.yaml")
    config = normalize_config(load_config(base, over))
    assert config["exp_name"] == "ludb/1over16"
    assert config["dataset"]["train_labeled_csv"] == \
        "LUDB_train_labeled_1over16.csv"
    assert config["dataset"]["signal_length"] == 2500  # base value preserved


@pytest.mark.skipif(not REFERENCE_CONFIGS,
                    reason="reference configs not mounted")
@pytest.mark.parametrize(
    "path", REFERENCE_CONFIGS,
    ids=[os.path.basename(os.path.dirname(p)) + "/" + os.path.basename(p)
         for p in REFERENCE_CONFIGS])
def test_reference_configs_load_unmodified(path):
    """The 12 base configs shipped by the reference repo run through our
    loader, normaliser, model builder and algorithm registry as-is
    (device: cuda / use_amp / ddp keys accepted and mapped)."""
    config = normalize_config(load_config(path))
    assert config["precision"] == "bf16"  # use_amp: true mapped
    get_algorithm(config["algorithm"])
    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, steps_per_epoch=10, model=model)
    assert tx is not None
