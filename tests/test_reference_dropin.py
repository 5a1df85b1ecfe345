"""Drop-in proof: the reference repo's own shipped config file trains
end-to-end in this framework (only dataset paths + test-scale knobs
overridden, exactly how `-o` bench overrides work)."""

import json
import os

import numpy as np
import pytest

REFERENCE_CFG = "/root/reference/configs/base/resnet18/fixmatch.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CFG), reason="reference configs not mounted"
)


def test_reference_fixmatch_config_trains(e2e_data, tmp_path):
    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from semi_seg_ecg_tpu.config import deep_merge, load_config, normalize_config

    config = load_config(REFERENCE_CFG)
    override = {
        "output_dir": str(tmp_path),
        "exp_name": "ref_dropin",
        "dataset": {
            **e2e_data,
            # shrink the recipe's fixed lengths to the fixture's
            "signal_length": 500,
            "augmentations": [
                {"random_resize_crop": {"target_length": 500,
                                        "scale_min": 0.5, "scale_max": 2.0}},
            ],
        },
        "dataloader": {"batch_size": 1, "num_workers": 2},
        "train": {"epochs": 1, "warmup_epochs": 0},
        "device": "cpu",
        "use_amp": False,
    }
    config = normalize_config(deep_merge(config, override))
    # untouched reference keys drive the run: algorithm, backbone,
    # decode_head, filter/strong_augmentations/transforms, metric, ddp...
    assert config["algorithm"] == "fixmatch"
    assert config["train"]["conf_thresh"] == 0.80
    assert config["ddp"]["dist_backend"] == "nccl"  # accepted, ignored
    algo = get_algorithm(config["algorithm"])
    algo.train(config)
    exp = os.path.join(str(tmp_path), "ref_dropin")
    with open(os.path.join(exp, "log.txt")) as f:
        line = json.loads(f.readline())
    assert np.isfinite(line["train_loss"])
    assert "train_mask_ratio" in line
    assert os.path.exists(os.path.join(exp, "best-MeanIoU.ckpt"))
