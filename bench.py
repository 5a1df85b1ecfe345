"""Headline benchmark: FixMatch ResNet18-1D training throughput per chip.

Workload matches the reference's north-star recipe shape (FixMatch,
configs/base/resnet18/fixmatch.yaml: batch 16, signal length 2500, AdamW,
bf16 compute): each timed step = eval-mode pseudo-label forward on the weak
unlabeled view + train forward on concat(labeled, strong) + backward +
optimizer update — all one jitted XLA program.

Baseline: the measured PyTorch-CPU equivalent (tools/bench_torch_baseline.py;
see BASELINE.md) — the reference repo publishes no numbers (SURVEY §6).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}``
"""

import json
import os
import time

import numpy as np

# Measured on this machine via tools/bench_torch_baseline.py (torch 2.13 CPU,
# batch 16, len 2500): 4.74 samples/sec. Override with env if re-measured.
BASELINE_SAMPLES_PER_SEC = float(
    os.environ.get("BASELINE_SAMPLES_PER_SEC", "4.74")
)
BASELINE_PROVENANCE = {
    "value": BASELINE_SAMPLES_PER_SEC,
    "unit": "samples/sec",
    "workload": "FixMatch ResNet18-1D train step, batch 16, len 2500",
    "tool": "tools/bench_torch_baseline.py",
    "measured_on": ("env:BASELINE_SAMPLES_PER_SEC"
                    if "BASELINE_SAMPLES_PER_SEC" in os.environ
                    else "torch 2.13 CPU, this image, 2026-08 (BASELINE.md)"),
}

# Peak dense bf16 FLOP/s per chip by device kind, for the MFU estimate
# (public TPU spec sheets; v5e = 197 TF bf16).
_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _flops_per_call(compiled) -> float:
    """XLA-reported FLOPs for one compiled step (0.0 if unavailable)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main(steps: int = 100, warmup: int = 10) -> None:
    import jax

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.algorithms.fixmatch import SPEC, make_train_step
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import (
        batch_sharding, data_parallel_size, make_mesh, replicated,
    )
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    batch_per_replica = 16
    sig_len = 2500
    config = _flagship_config(signal_length=sig_len,
                              batch_per_replica=batch_per_replica)
    mesh = make_mesh(config)
    n_chips = len(jax.devices())
    dp = data_parallel_size(mesh)
    global_batch = batch_per_replica * dp

    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, steps_per_epoch=1000, model=model)
    state = build_state(config, model, tx, SPEC, seed=0)
    state = jax.device_put(state, replicated(mesh))

    rng = np.random.default_rng(0)
    batch = {
        "ecg": rng.standard_normal(
            (global_batch, 1, sig_len)).astype("float32"),
        "target": rng.integers(0, 4, (global_batch, sig_len)),
        "ecg_u_w": rng.standard_normal(
            (global_batch, 1, sig_len)).astype("float32"),
        "ecg_u_s": rng.standard_normal(
            (global_batch, 1, sig_len)).astype("float32"),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))

    # BENCH_SCAN_STEPS>1 exercises the train.scan_steps path (K steps per
    # dispatch; 2.3x per-step dispatch through a congested link, see
    # NOTES.md) — the default stays per-step for comparability across rounds
    scan_k = int(os.environ.get("BENCH_SCAN_STEPS", "1"))
    inner = make_train_step(model, tx, config, 1000)
    if scan_k > 1:
        from semi_seg_ecg_tpu.parallel.mesh import shard_stacked_batch

        stacked = {
            k: np.broadcast_to(np.asarray(v)[None],
                               (scan_k,) + np.asarray(v).shape).copy()
            for k, v in jax.device_get(batch).items()
        }
        stacked = shard_stacked_batch(mesh, stacked)
        train_step = jax.jit(
            lambda s, b: jax.lax.scan(lambda c, x: inner(c, x), s, b),
            donate_argnums=0,
        )
        run_batch = stacked
    else:
        train_step = jax.jit(inner, donate_argnums=0)
        run_batch = batch
    calls = max(steps // scan_k, 1)

    # one AOT compile serves both the timing loop and the FLOPs estimate
    # (jit dispatch would compile the same program a second time)
    compiled = train_step.lower(state, run_batch).compile()
    # per device, post-SPMD; cost_analysis counts a lax.scan BODY once, so
    # a K-step scan program must be scaled by its trip count
    flops_per_call = _flops_per_call(compiled) * scan_k

    for _ in range(max(warmup // scan_k, 2)):
        state, metrics = compiled(state, run_batch)
    jax.block_until_ready(metrics["loss"])

    # best of 3 trials: remote-tunnel scheduling noise only ever slows a
    # trial down, so the max is the cleanest hardware-rate estimate
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(calls):
            state, metrics = compiled(state, run_batch)
        jax.block_until_ready(metrics["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    samples_per_sec = calls * scan_k * global_batch / best_dt
    per_chip = samples_per_sec / n_chips

    # Model FLOP utilisation: XLA's own cost model for the whole jitted
    # step (fwd + bwd + optimizer, all passes) against the chip's peak.
    # cost_analysis() reports the per-device (post-SPMD-partition) FLOPs,
    # so this is already a per-chip rate — no further division.
    kind = jax.devices()[0].device_kind
    peak = _PEAK_BF16_FLOPS.get(kind)
    achieved_flops = flops_per_call * calls / best_dt
    mfu = round(achieved_flops / peak, 4) if peak and flops_per_call else None

    print(json.dumps({
        "metric": "fixmatch_resnet18_train_samples_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 2),
        "mfu": mfu,
        "flops_per_step": (flops_per_call / scan_k
                           if flops_per_call else None),  # one train step
        "device_kind": kind,
        "baseline": BASELINE_PROVENANCE,
    }))


if __name__ == "__main__":
    main()
