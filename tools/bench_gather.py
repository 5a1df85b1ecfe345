"""Pallas slope-bounded time-gather vs XLA take_along_axis lerp-gather.

The round-3 profile (NOTES.md) found the fused device-augment program's
time-axis gathers lower to scalarized gather-engine reads: 386 us each at
1.6 GB/s effective, zero FLOPs, six per step. ops/pallas/gather1d.py
replaces them with per-tile dynamic-span one-hot matmuls; this tool
measures both paths on the flagship augment shapes, plus the full
random_resize_crop_batch op end to end, at the recipe batch (16) and a
serving-scale batch (256).

Slope-timed with the value-fetch barrier (bench.py machinery). Prints one
JSON line. Run: ``python tools/bench_gather.py [--batch 16 256]``.
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _time(fn, args_, calls):
    import jax

    compiled = jax.jit(fn).lower(*args_).compile()

    class _Shim:
        def __call__(self, state, batch):
            return state, {"loss": compiled(*args_)}

    dt, _, barrier = bench._measure(_Shim(), 0, None, calls)
    return dt / calls, barrier


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[16, 256])
    ap.add_argument("--length", type=int, default=2500)
    ap.add_argument("--calls", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from semi_seg_ecg_tpu.ops import preprocess
    from semi_seg_ecg_tpu.ops.pallas import gather1d

    link = bench.probe_link()
    interpret = jax.default_backend() != "tpu"
    t = args.length
    rows = {}
    for b in args.batch:
        rng = np.random.default_rng(0)
        x = jax.device_put(
            rng.standard_normal((b, 1, t)).astype(np.float32))
        y = jax.device_put(rng.integers(0, 4, (b, t)).astype(np.int32))
        ratio = rng.uniform(0.5, 2.0, (b, 1))
        pos = jax.device_put(np.clip(
            np.arange(t)[None, :] / ratio, 0, t - 1).astype(np.float32))

        def xla(x, pos):
            return jnp.sum(gather1d._xla_gather(x, pos))

        def kernel(x, pos):
            return jnp.sum(gather1d._pallas_gather(
                x, pos, max_slope=2.0, block_j=gather1d.DEFAULT_BLOCK_J,
                interpret=interpret))

        def rrc(key, x, y):
            xo, yo = preprocess.random_resize_crop_batch(key, x, y)
            return jnp.sum(xo) + jnp.sum(yo)

        key = jax.random.PRNGKey(0)
        row = {}
        barriers = {}
        try:
            for name, fn, a in [("xla_gather_us", xla, (x, pos)),
                                ("pallas_gather_us", kernel, (x, pos))]:
                s, barriers[name] = _time(fn, a, args.calls)
                row[name] = round(s * 1e6, 1)
            for impl in ("xla", "pallas" if not interpret else "interpret"):
                gather1d.GATHER_IMPL = impl
                # jax's tracing cache is keyed on function identity, not on
                # the GATHER_IMPL global it closes over: re-jitting the same
                # `rrc` object after flipping the knob silently reuses the
                # previous impl's trace. A fresh wrapper defeats the cache.
                rrc_fresh = functools.partial(rrc)
                s, barriers[f"rrc_{impl}"] = _time(rrc_fresh, (key, x, y),
                                                   args.calls)
                row[f"rrc_{impl}_us"] = round(s * 1e6, 1)
        finally:
            gather1d.GATHER_IMPL = "auto"
        row["speedup"] = round(row["xla_gather_us"]
                               / max(row["pallas_gather_us"], 1e-9), 2)
        # one barrier label per batch row; a mid-run degradation to
        # block_until_ready (wedged D2H) must not be masked by the last
        # measurement's mode
        modes = set(barriers.values())
        row["barrier"] = (modes.pop() if len(modes) == 1
                          else "mixed:" + ",".join(
                              f"{k}={v}" for k, v in sorted(barriers.items())))
        rows[f"batch{b}"] = row
        print(f"# batch {b}: {row}", file=sys.stderr)

    print(json.dumps({
        "metric": "time_gather_pallas_vs_xla",
        "device_kind": jax.devices()[0].device_kind,
        "length": t,
        "rows": rows,
        "link": link,
    }))


if __name__ == "__main__":
    main()
