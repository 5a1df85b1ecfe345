"""Gradient accumulation (accum_iter > 1) through optax.MultiSteps."""

import json
import os

import numpy as np

from semi_seg_ecg_tpu.algorithms import get_algorithm


def test_base_accum_iter(synth_dataset_cfg, tmp_path):
    from tests.test_algorithms_e2e import make_config

    config = make_config(dict(synth_dataset_cfg), tmp_path, "base",
                         accum_iter=2, epochs=1)
    config["dataset"]["augmentations"] = [
        {"random_resize_crop": {"target_length": 2500,
                                "scale_min": 0.5, "scale_max": 2.0}},
    ]
    algo = get_algorithm("base")
    algo.train(config)
    exp = os.path.join(config["output_dir"], config["exp_name"])
    with open(os.path.join(exp, "log.txt")) as f:
        line = json.loads(f.readline())
    assert np.isfinite(line["train_loss"])
    assert os.path.exists(os.path.join(exp, "best-loss.ckpt"))
