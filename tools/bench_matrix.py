"""Training-throughput matrix across backbones and algorithms.

Times one jitted train step (supervised and FixMatch) for several model
configurations on the available device and prints a table — broader
coverage than the single headline metric in bench.py.

Run: ``python tools/bench_matrix.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODELS = {
    "resnet18": ({"resnet18": {"num_leads": 1, "num_stages": 4,
                               "out_indices": [0, 1, 2, 3],
                               "dilations": [1, 1, 1, 1],
                               "strides": [1, 2, 2, 2], "deep_stem": False,
                               "avg_down": False,
                               "contract_dilation": False}}, 512),
    "resnet50": ({"resnet50": {"num_leads": 1, "num_stages": 4,
                               "out_indices": [0, 1, 2, 3],
                               "dilations": [1, 1, 1, 1],
                               "strides": [1, 2, 2, 2], "deep_stem": False,
                               "avg_down": False,
                               "contract_dilation": False}}, 2048),
    "vit_tiny": ({"vit_tiny": {"seq_len": 2500, "patch_size": 25,
                               "num_leads": 1, "fp16_enabled": True}}, 192),
    "vit_base": ({"vit_base": {"seq_len": 2500, "patch_size": 25,
                               "num_leads": 1, "fp16_enabled": True}}, 768),
}


def bench_one(model_name, algo_name, batch=16, sig_len=2500, steps=50):
    import jax

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms import base as base_algo
    from semi_seg_ecg_tpu.algorithms import fixmatch as fixmatch_algo
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated,
    )
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    backbone_cfg, head_in = MODELS[model_name]
    config = _flagship_config(signal_length=sig_len, batch_per_replica=batch)
    config["backbone"] = backbone_cfg
    config["decode_head"]["FCNHead"]["in_channels"] = head_in
    algo = base_algo if algo_name == "base" else fixmatch_algo

    mesh = make_mesh(config)
    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, 1000, model=model)
    state = jax.device_put(build_state(config, model, tx, algo.SPEC, 0),
                           replicated(mesh))
    rng = np.random.default_rng(0)
    b = batch * mesh.shape["data"]
    data = {"ecg": rng.standard_normal((b, 1, sig_len)).astype("float32"),
            "target": rng.integers(0, 4, (b, sig_len))}
    if algo_name == "fixmatch":
        data["ecg_u_w"] = rng.standard_normal((b, 1, sig_len)).astype("float32")
        data["ecg_u_s"] = rng.standard_normal((b, 1, sig_len)).astype("float32")
    data = jax.device_put(data, batch_sharding(mesh))
    step = jax.jit(algo.make_train_step(model, tx, config, 1000),
                   donate_argnums=0)
    for _ in range(10):
        state, m = step(state, data)
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, data)
        jax.block_until_ready(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1000, steps * b / best


def main():
    print(f"{'model':10s} {'algorithm':10s} {'ms/step':>9s} {'samples/s':>11s}")
    for model_name in MODELS:
        for algo_name in ("base", "fixmatch"):
            ms, sps = bench_one(model_name, algo_name)
            print(f"{model_name:10s} {algo_name:10s} {ms:9.2f} {sps:11.0f}")


if __name__ == "__main__":
    main()
