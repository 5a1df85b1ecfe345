"""Live-stream monitoring capacity: concurrent real-time ECG streams/chip.

Times the StreamingSegmenter's jitted step (windowed forward + overlap
carry blend) at a stream-batch of S: each step finalizes ``hop`` samples
for S streams, and a live 250 Hz stream produces one window per
``hop/250`` s, so capacity = S x (hop/fs) / step_time. Run:

  python tools/bench_streams.py [--streams 256] [--int8] [--hop 2500]

Two timings, same discipline as bench.py: per-step (a Python loop of
dispatches — includes host/link overhead, the lower bound) and scan32
(32 steps fused into one dispatch via lax.scan — the device-rate upper
bound; also a realistic deployment shape where a frontend micro-batches
ticks). Reports the scan number as the headline with both shown.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--hop", type=int, default=WINDOW)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--scan", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms.common import init_model_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.serving import StreamingSegmenter

    config = _flagship_config()
    if args.int8:
        config["quantize"] = "int8"
    model = build_model_from_config(config, train=False, serving=True)
    state = init_model_state(model, config, 0)
    quant = None
    if args.int8:
        from semi_seg_ecg_tpu.utils.calibrate import calibrate_quant

        cal_rng = np.random.default_rng(1)
        quant = calibrate_quant(
            model, state.params, state.batch_stats,
            (jnp.asarray(cal_rng.standard_normal((16, 1, WINDOW)),
                         jnp.float32) for _ in range(4)))

    def infer(x):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, x, train=False)
        return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=1)

    S = args.streams
    seg = StreamingSegmenter(infer, window=WINDOW, hop=args.hop,
                             num_streams=S)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((S, 1, WINDOW)), jnp.float32)
    acc0, wacc0 = jnp.asarray(seg._acc), jnp.asarray(seg._wacc)

    # --- per-step: Python loop of jitted dispatches -----------------------
    out = seg._step(win, acc0, wacc0)
    jax.block_until_ready(out)

    def run_steps(n):
        acc, wacc = acc0, wacc0
        t0 = time.perf_counter()
        for _ in range(n):
            probs, labels, acc, wacc = seg._step(win, acc, wacc)
        float(labels[0, 0])  # value fetch barrier
        return time.perf_counter() - t0

    n = 16
    diffs = sorted(d for d in (run_steps(2 * n) - run_steps(n)
                               for _ in range(args.reps)) if d > 0)
    per_step = (diffs[len(diffs) // 2] / n) if diffs else run_steps(n) / n

    # --- scan: K steps in one dispatch (device-rate bound) ----------------
    # each step must see DIFFERENT input — a loop-invariant window lets
    # XLA hoist the whole forward out of the scan and the number is fake
    K = args.scan
    wins = jnp.asarray(rng.standard_normal((K, S, 1, WINDOW)), jnp.float32)

    @jax.jit
    def scan_steps(wins, acc, wacc):
        def body(carry, win):
            acc, wacc = carry
            probs, labels, acc, wacc = seg._step_fn(win, acc, wacc)
            return (acc, wacc), labels[0, 0]
        (acc, wacc), ls = jax.lax.scan(body, (acc, wacc), wins)
        return acc, wacc, ls

    out = scan_steps(wins, acc0, wacc0)
    jax.block_until_ready(out)

    def run_scan(n):
        acc, wacc = acc0, wacc0
        t0 = time.perf_counter()
        for _ in range(n):
            acc, wacc, ls = scan_steps(wins, acc, wacc)
        float(ls[-1])
        return time.perf_counter() - t0

    diffs = sorted(d for d in (run_scan(2) - run_scan(1)
                               for _ in range(args.reps)) if d > 0)
    scan_step = ((diffs[len(diffs) // 2]) / K) if diffs else run_scan(1) / K

    tick = args.hop / FS  # seconds of signal one step finalizes per stream
    result = {
        "metric": "live_stream_capacity",
        "value": round(S * tick / scan_step),
        "unit": "concurrent 250Hz streams/chip (scan32 device rate)",
        "streams_batched": S,
        "hop": args.hop,
        "quantize": "int8-static" if args.int8 else None,
        "ms_per_step_scan": round(scan_step * 1e3, 3),
        "ms_per_step_dispatch": round(per_step * 1e3, 3),
        "streams_at_dispatch_rate": round(S * tick / per_step),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
