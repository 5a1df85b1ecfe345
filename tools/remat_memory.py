"""Quantify remat's memory win at compile time (no device run needed).

``backbone.remat: true`` wraps every residual/transformer block in
``jax.checkpoint`` so the backward recomputes block interiors instead of
saving them. The knob's correctness is pinned (tests/test_remat.py:
bit-identical losses and gradients), but its SIZE was only ever asserted —
``device.memory_stats()`` returns None through the axon tunnel. The
blocker never applied to ``jit(...).lower(...).compile()
.memory_analysis()``, which reports the compiled program's per-device
temp/argument/output bytes without touching hardware (the same oracle the
long-record study uses, tools/bench_longrec.py --mem). This tool prints
the remat on/off table for the flagship FixMatch ResNet18 step and the
ViT supervised step; tests/test_remat.py pins the ratio at test scale.

Run: ``python tools/remat_memory.py [--batch 64] [--length 2500] [--cpu]``
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def step_memory(algorithm, backbone_cfg, head_in, batch, length,
                remat, precision="bf16"):
    """Compiled per-device memory of the full train step (abstract args —
    nothing is allocated or executed)."""
    import jax

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms import base as base_algo
    from semi_seg_ecg_tpu.algorithms import fixmatch as fixmatch_algo
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    spec_mod = {"base": base_algo, "fixmatch": fixmatch_algo}[algorithm]
    config = _flagship_config(signal_length=length, batch_per_replica=batch)
    config["algorithm"] = algorithm
    config["precision"] = precision
    name = next(iter(backbone_cfg))
    config["backbone"] = {name: {**backbone_cfg[name], "remat": remat}}
    config["decode_head"]["FCNHead"]["in_channels"] = head_in

    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, steps_per_epoch=10, model=model)
    state = build_state(config, model, tx, spec_mod.SPEC, seed=0)
    state_abs = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), state)
    import numpy as np

    batch_abs = {
        "ecg": jax.ShapeDtypeStruct((batch, 1, length), np.float32),
        "target": jax.ShapeDtypeStruct((batch, length), np.int32),
    }
    if algorithm == "fixmatch":
        batch_abs["ecg_u_w"] = jax.ShapeDtypeStruct((batch, 1, length),
                                                    np.float32)
        batch_abs["ecg_u_s"] = jax.ShapeDtypeStruct((batch, 1, length),
                                                    np.float32)
    step = jax.jit(spec_mod.make_train_step(model, tx, config, 10),
                   donate_argnums=0)
    t0 = time.time()
    ma = step.lower(state_abs, batch_abs).compile().memory_analysis()
    return {"temp_bytes": int(ma.temp_size_in_bytes),
            "arg_bytes": int(ma.argument_size_in_bytes),
            "compile_s": round(time.time() - t0, 1)}


RESNET = {"resnet18": {"num_leads": 1, "num_stages": 4,
                       "out_indices": [0, 1, 2, 3],
                       "dilations": [1, 1, 1, 1], "strides": [1, 2, 2, 2],
                       "deep_stem": False, "avg_down": False,
                       "contract_dilation": False}}


def vit(length, patch=25):
    return {"vit_tiny": {"seq_len": length, "patch_size": patch,
                         "num_leads": 1, "fp16_enabled": True}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--length", type=int, default=2500)
    ap.add_argument("--cpu", action="store_true",
                    help="compile for CPU (memory_analysis is about the "
                         "compiled program, not the attached hardware)")
    ap.add_argument("--out", default="bench_logs/remat_memory.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    rows = []
    for label, algorithm, bb, head_in in (
            ("fixmatch_resnet18", "fixmatch", RESNET, 512),
            ("base_vit_tiny", "base", vit(args.length), 192)):
        row = {"workload": label, "batch": args.batch,
               "length": args.length}
        for remat in (False, True):
            m = step_memory(algorithm, bb, head_in, args.batch,
                            args.length, remat)
            key = "remat" if remat else "noremat"
            row[key] = m
            print(f"{label:20s} remat={remat}: temp "
                  f"{m['temp_bytes']/2**20:8.1f} MiB  args "
                  f"{m['arg_bytes']/2**20:8.1f} MiB  "
                  f"(compile {m['compile_s']}s)")
        row["temp_ratio"] = round(
            row["remat"]["temp_bytes"] / max(row["noremat"]["temp_bytes"], 1),
            4)
        print(f"{label:20s} remat temp ratio: {row['temp_ratio']}")
        rows.append(row)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
