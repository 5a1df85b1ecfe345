"""Batch-scaling study of the flagship train step (throughput + MFU vs B).

The headline bench (bench.py) pins the reference recipe's batch 16
(configs/base/resnet18/fixmatch.yaml) — this tool answers the production
question behind it: how far does one chip's throughput/MFU rise as the
per-replica batch grows, and where does it saturate? Large-batch training
is the default posture on TPU pods (per-chip batch is whatever fills the
MXU; the recipe batch is recovered by splitting over the mesh), so the
saturation point is the number that sizes a real deployment.

Reuses bench.py's tunnel-proofing verbatim: link-health probe, slope
timing with the value-fetch barrier, and the lax.scan dispatch-amortising
mode (compute-only, so a wedged D2H path does not corrupt it).

Run: ``python tools/bench_scale.py [--batches 16 32 64 128 256]``.
Prints one JSON line with the sweep table.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def measure(batch: int, scan_k: int, steps: int):
    import jax

    compiled, state, run_batch, flops_call, global_batch = bench._build(
        scan_k, batch_per_replica=batch)
    calls = max(steps // scan_k, 1)
    dt, _, barrier = bench._measure(compiled, state, run_batch, calls)
    sps = calls * scan_k * global_batch / dt
    peak = bench._PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
    mfu = (round(flops_call * calls / dt / peak, 4)
           if peak and flops_call else None)
    return {
        "batch_per_replica": batch,
        "samples_per_sec": round(sps, 1),
        "ms_per_step": round(1e3 * global_batch / sps, 3),
        "mfu": mfu,
        "flops_per_step": flops_call / scan_k if flops_call else None,
        "barrier": barrier,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 32, 64, 128, 256])
    ap.add_argument("--scan", type=int, default=32,
                    help="lax.scan steps per dispatch (1 = per-step)")
    ap.add_argument("--steps", type=int, default=96,
                    help="timed steps per slope unit")
    args = ap.parse_args()

    import jax

    link = bench.probe_link()
    rows = []
    for b in args.batches:
        row = measure(b, args.scan, args.steps)
        rows.append(row)
        print(f"# B={b:4d}: {row['samples_per_sec']:9.0f} samples/s  "
              f"{row['ms_per_step']:7.3f} ms/step  MFU={row['mfu']}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "fixmatch_resnet18_batch_scaling",
        "device_kind": jax.devices()[0].device_kind,
        "scan_steps": args.scan,
        "link": link,
        "sweep": rows,
    }))


if __name__ == "__main__":
    main()
