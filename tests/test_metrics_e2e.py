"""Per-class metric flattening through the full test pipeline
(base.py:227-237 + test_metrics.csv parity)."""

import os

import pandas as pd

from semi_seg_ecg_tpu.algorithms import get_algorithm
from semi_seg_ecg_tpu.algorithms.common import _host_shard_args


def test_per_class_metrics_in_csv(e2e_data, tmp_path):
    from tests.test_algorithms_e2e import make_config

    config = make_config(e2e_data, tmp_path, "base", epochs=1)
    config["metric"]["target_metrics"] = [
        "MeanIoU",
        {"DiceScore": {"per_class": True}},
    ]
    algo = get_algorithm("base")
    algo.train(config)
    metrics = algo.test(config)
    # flattened per-class keys (the reference's {k}_{i} convention)
    assert {"DiceScore_0", "DiceScore_1", "DiceScore_2",
            "DiceScore_3"} <= set(metrics)
    csv = pd.read_csv(os.path.join(config["output_dir"], config["exp_name"],
                                   "test_metrics.csv"))
    assert "MeanIoU" in csv.columns
    assert "DiceScore_2" in csv.columns
    assert "loss" in csv.columns


def test_host_shard_args_single_process():
    args = _host_shard_args(8)
    assert args == {"shard_offset": 0, "local_shards": 8}
