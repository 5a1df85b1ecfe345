"""Inference (serving) throughput benchmark.

Times the jitted eval-mode forward + softmax of the flagship segmentor
(ResNet18-1D + FCN head, length 2500) across batch sizes on the available
device. Run: ``python tools/bench_inference.py [--int8]``.

``--int8`` serves the dynamically quantized model (``quantize: int8``,
ops/quant.py): s8 x s8 -> s32 convs run the MXU at twice the bf16 rate,
so MXU-bound large-batch serving approaches 2x.
"""

import argparse

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="serve the dynamically int8-quantized model")
    ap.add_argument("--static", action="store_true",
                    help="with --int8: calibrate static activation scales "
                         "first (utils/calibrate.py) — removes the "
                         "per-layer absmax reductions")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms.common import init_model_state
    from semi_seg_ecg_tpu.models import build_model_from_config

    config = _flagship_config()
    if args.int8:
        config["quantize"] = "int8"
    model = build_model_from_config(config, train=False, serving=True)
    state = init_model_state(model, config, 0)

    quant = None
    if args.static:
        assert args.int8, "--static needs --int8"
        from semi_seg_ecg_tpu.utils.calibrate import calibrate_quant

        cal_rng = np.random.default_rng(1)
        quant = calibrate_quant(
            model, state.params, state.batch_stats,
            (jnp.asarray(cal_rng.standard_normal((16, 1, 2500)),
                         jnp.float32) for _ in range(4)))

    @jax.jit
    def infer(params, batch_stats, x):
        variables = {"params": params, "batch_stats": batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, x, train=False)
        return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=1)

    rng = np.random.default_rng(0)
    for batch in (16, 64, 256):
        x = jnp.asarray(rng.standard_normal((batch, 1, 2500)), jnp.float32)
        jax.block_until_ready(infer(state.params, state.batch_stats, x))

        # slope timing with a value-fetch barrier (same discipline as
        # bench.py): the remote tunnel releases block_until_ready early
        # and charges a fixed RTT per fetch — T(2N)-T(N) cancels both.
        # Programs execute in launch order on the device stream, so a
        # scalar fetch from the LAST output proves all N are done.
        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = infer(state.params, state.batch_stats, x)
            float(out[0, 0, 0])  # value fetch: cannot return early
            return time.perf_counter() - t0

        n = 50
        diffs = sorted(d for d in (run(2 * n) - run(n) for _ in range(3))
                       if d > 0)
        best = diffs[len(diffs) // 2] if diffs else run(n)
        sps = n * batch / best
        print(f"batch {batch:4d}: {best / n * 1000:7.2f} ms/batch "
              f"{sps:10.0f} samples/sec")


if __name__ == "__main__":
    main()
