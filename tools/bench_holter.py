"""Holter-scale inference throughput: hours of ECG through the stitcher.

Measures ``ops/stitch.overlap_add_infer`` end to end on the flagship
segmentor (ResNet18-1D + FCN head, 2,500-sample windows @ 250 Hz): one
jitted scan windows the on-device record, standardizes, runs the model
and taper-stitches — the question is how fast a whole monitoring session
segments on one chip. Run:

  python tools/bench_holter.py [--hours 1.0] [--int8] [--hop 1250]
                               [--batch 64]

Timing uses the repo's slope discipline (T(2N)-T(N) with a value-fetch
barrier) so tunnel RTT and early-release ``block_until_ready`` cannot
inflate the number; the stitched probabilities stay on device.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 250
WINDOW = 2500


def synth_record(hours: float, seed: int = 0) -> np.ndarray:
    """An ECG-shaped test signal: periodic sharp pulses + baseline wander
    + noise. Content does not affect throughput; shaped data keeps the
    per-window standardization honest (non-degenerate std)."""
    n = int(round(hours * 3600 * FS))
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float32) / FS
    beat_phase = (t % 0.8) / 0.8  # ~75 bpm
    qrs = np.exp(-((beat_phase - 0.5) ** 2) / 2e-4).astype(np.float32)
    wander = 0.2 * np.sin(2 * np.pi * 0.05 * t).astype(np.float32)
    noise = rng.normal(0.0, 0.05, n).astype(np.float32)
    return (qrs + wander + noise)[None, :]  # (1, T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=1.0)
    ap.add_argument("--hop", type=int, default=WINDOW,
                    help=f"window stride (default {WINDOW} = no overlap; "
                         f"{WINDOW // 2} = 50%% overlap, 2x compute)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--int8", action="store_true",
                    help="int8 model with static activation scales "
                         "calibrated on record windows")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms.common import init_model_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.ops.stitch import overlap_add_infer, plan_windows

    config = _flagship_config()
    if args.int8:
        config["quantize"] = "int8"
    model = build_model_from_config(config, train=False, serving=True)
    state = init_model_state(model, config, 0)

    record_np = synth_record(args.hours)

    quant = None
    if args.int8:
        from semi_seg_ecg_tpu.utils.calibrate import calibrate_quant

        def _cal_batches(n_batches=4, per=16):
            # calibrate on what the model will actually see: standardized
            # windows sliced from the record (modulo for short records)
            n_avail = max(1, record_np.shape[1] // WINDOW)
            for b in range(n_batches):
                wins = np.stack([
                    record_np[:, ((b * per + i) % n_avail) * WINDOW:
                              (((b * per + i) % n_avail) + 1) * WINDOW]
                    for i in range(per)])
                mu = wins.mean(axis=(1, 2), keepdims=True)
                sd = wins.std(axis=(1, 2), keepdims=True)
                yield jnp.asarray((wins - mu) / np.where(sd == 0, 1, sd),
                                  jnp.float32)

        quant = calibrate_quant(model, state.params, state.batch_stats,
                                _cal_batches())

    def infer(x):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, x, train=False)
        return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=1)

    record = jnp.asarray(record_np)
    total = record.shape[1]
    n_win, _, _, _ = plan_windows(total, WINDOW, args.hop, args.batch)
    print(f"record: {args.hours:g} h = {total:,} samples; "
          f"{n_win:,} windows (hop {args.hop}), batch {args.batch}, "
          f"{'int8' if args.int8 else 'float'}", file=sys.stderr)

    t0 = time.perf_counter()
    probs, labels = overlap_add_infer(infer, record, window=WINDOW,
                                      hop=args.hop, batch=args.batch)
    float(labels[0])  # value fetch: compile + first run complete
    print(f"compile+first run: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            _, labels = overlap_add_infer(infer, record, window=WINDOW,
                                          hop=args.hop, batch=args.batch)
            # value-fetch EVERY call: dispatch is async, so syncing only
            # the last program lets the others pipeline and the (2-1)
            # diff collapses toward zero (observed: a "2.9 G samples/s"
            # 1-hour record in the round-5 sweep). A one-scalar fetch per
            # call forces each program to completion; the per-call RTT it
            # adds cancels in the diff.
            float(labels[0])
        return time.perf_counter() - t0

    diffs = sorted(d for d in (run(2) - run(1) for _ in range(args.reps))
                   if d > 0)
    sec = diffs[len(diffs) // 2] if diffs else run(1)

    sps = total / sec
    result = {
        "metric": "holter_inference_throughput",
        "value": round(sps, 1),
        "unit": "record_samples/s/chip",
        "record_hours": args.hours,
        "record_samples": total,
        "windows": n_win,
        "hop": args.hop,
        "batch": args.batch,
        "quantize": "int8-static" if args.int8 else None,
        "seconds_per_record": round(sec, 3),
        "record_hours_per_minute": round(args.hours * 60 / sec, 2),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
