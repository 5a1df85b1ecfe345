"""Bitwise training determinism + NaN-localisation debug mode."""

import json
import os

import numpy as np
import pytest


def _losses(tmp_path, e2e_data, name, epochs_override=2, **extra):
    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from tests.test_algorithms_e2e import make_config

    config = make_config(e2e_data, tmp_path, "base", epochs=epochs_override)
    config["exp_name"] = name
    config.update(extra)
    get_algorithm("base").train(config)
    exp = os.path.join(config["output_dir"], name)
    with open(os.path.join(exp, "log.txt")) as f:
        return [json.loads(l)["train_loss"] for l in f]


def test_training_is_deterministic(e2e_data, tmp_path):
    """Same seed → identical loss trajectory (the guarantee the reference
    approximates with torch.manual_seed, base.py:257-259)."""
    a = _losses(tmp_path, e2e_data, "run_a")
    b = _losses(tmp_path, e2e_data, "run_b")
    np.testing.assert_array_equal(a, b)
    assert len(a) == 2


def test_nan_checks_mode_runs(e2e_data, tmp_path):
    """debug.nan_checks flips jax_debug_nans: training still works on clean
    data, and NaN-producing programs raise at their source."""
    import jax

    try:
        losses = _losses(tmp_path, e2e_data, "run_checked", epochs_override=1,
                         debug={"nan_checks": True})
        assert np.isfinite(losses).all()
        assert jax.config.jax_debug_nans
        with pytest.raises(Exception):
            jax.jit(lambda x: x / 0.0 * 0.0)(1.0).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", False)
