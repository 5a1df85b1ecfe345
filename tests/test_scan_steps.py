"""Device-side multi-step loop (train.scan_steps): same results, fewer
dispatches."""

import json
import os

import numpy as np


def _train(e2e_data, tmp_path, name, scan_steps, epochs=2):
    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from tests.test_algorithms_e2e import make_config

    config = make_config(e2e_data, tmp_path, "fixmatch", epochs=epochs,
                         scan_steps=scan_steps)
    config["exp_name"] = name
    # batch 1 x 8 shards over 16 unlabeled samples → 2 steps/epoch
    get_algorithm("fixmatch").train(config)
    exp = os.path.join(config["output_dir"], name)
    with open(os.path.join(exp, "log.txt")) as f:
        return [json.loads(l) for l in f]


def test_scan_steps_matches_per_step_dispatch(e2e_data, tmp_path):
    per_step = _train(e2e_data, tmp_path, "nos can", scan_steps=1)
    scanned = _train(e2e_data, tmp_path, "scan2", scan_steps=2)
    assert len(per_step) == len(scanned) == 2
    for a, b in zip(per_step, scanned):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-3)
        np.testing.assert_allclose(a["valid_loss"], b["valid_loss"],
                                   rtol=1e-3)


def test_scan_steps_with_epoch_tail(e2e_data, tmp_path):
    # scan window larger than steps/epoch → tail path handles everything
    logs = _train(e2e_data, tmp_path, "scan_big", scan_steps=8, epochs=1)
    assert np.isfinite(logs[0]["train_loss"])
