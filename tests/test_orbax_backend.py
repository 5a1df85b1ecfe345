"""Orbax directory-checkpoint backend (checkpoint_backend: orbax)."""

import json
import os

import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from semi_seg_ecg_tpu.utils import checkpoint as ckpt  # noqa: E402
from semi_seg_ecg_tpu.utils.train_state import ModelState  # noqa: E402


def test_orbax_roundtrip(tmp_path, rng):
    ms = ModelState(
        params={"a": {"w": jnp.asarray(rng.standard_normal((4, 3)))}},
        batch_stats={"a": {"m": jnp.zeros((3,))}},
    )
    tx = optax.adamw(1e-3)
    opt = tx.init(ms.params)
    path = os.path.join(tmp_path, "best-loss.ckpt")
    ckpt.save_checkpoint(path, epoch=3, model_state=ms, opt_state=opt,
                         config={"seed": 0}, metrics={"MeanIoU": 0.9},
                         step=11, backend="orbax")
    ckpt.wait_for_pending()
    assert os.path.isdir(path)
    payload = ckpt.load_checkpoint(path)
    assert payload["epoch"] == 3 and payload["step"] == 11
    restored = ckpt.restore_model_state(payload["model"], ms)
    np.testing.assert_array_equal(np.asarray(restored.params["a"]["w"]),
                                  np.asarray(ms.params["a"]["w"]))
    opt2 = ckpt.restore_opt_state(opt, payload["optimizer"])
    for a, b in zip(__import__("jax").tree.leaves(opt2),
                    __import__("jax").tree.leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_backend_e2e(e2e_data, tmp_path):
    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from tests.test_algorithms_e2e import make_config

    config = make_config(e2e_data, tmp_path, "base", epochs=1)
    config["checkpoint_backend"] = "orbax"
    algo = get_algorithm("base")
    algo.train(config)
    exp = os.path.join(config["output_dir"], config["exp_name"])
    assert os.path.isdir(os.path.join(exp, "best-loss.ckpt"))
    # test entry reads the directory checkpoint transparently
    metrics = algo.test(config)
    assert 0.0 <= metrics["MeanIoU"] <= 1.0
