"""Kernel-level profile of the flagship FixMatch train step (VERDICT r2 #1).

Captures a ``jax.profiler.trace`` of N executed steps (the per-step program
by default; ``--scan K`` profiles the ``lax.scan`` K-steps-per-dispatch
program instead, for the scan-vs-dispatch anomaly), converts the xplane
with the installed ``xprof`` tooling, and prints:

- the top kernels by self time (name, category, occurrences, total µs,
  per-step µs, %)
- a category rollup (convolution / fusion / all-reduce / ...)
- the per-step device-busy time implied by the trace vs the wall step time

Usage:
  python tools/profile_step.py [--steps 20] [--scan K] [--out DIR]
      [--tool hlo_stats] [--keep]

Works on CPU (functional check) and TPU (the real target). The trace dir is
deleted afterwards unless --keep.
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows_from_gviz(data):
    """gviz DataTable JSON → list of dicts keyed by column id."""
    if isinstance(data, (bytes, str)):
        data = json.loads(data)
    if isinstance(data, list):  # framework_op_stats returns [device, host]
        data = data[0]
    cols = [c.get("id") or c.get("label") for c in data["cols"]]
    rows = []
    for r in data["rows"]:
        rows.append({c: (cell or {}).get("v") for c, cell in
                     zip(cols, r["c"])})
    return rows


def capture(steps: int, scan_k: int, logdir: str, augment: bool = False,
            batch: int = 16):
    """Run the benchmark program under the profiler; returns wall s/step.

    ``augment`` composes the flagship device-side augmentation chain
    (random_resize_crop weak view + RandAugment strong view + standardize,
    tools/gen_configs.py flagship_data_recipe) in front of the train step —
    the cache-mode fused program, raw views in, update out."""
    import jax

    from bench import _build  # the exact benchmarked program

    compiled, state, run_batch, _, _ = _build(max(scan_k, 1),
                                              aot=not augment,
                                              batch_per_replica=batch)
    if augment:
        assert scan_k <= 1, "--augment profiles the per-step program"
        from tools.gen_configs import flagship_data_recipe

        from semi_seg_ecg_tpu.ops.preprocess import plan_device_augment

        plan = plan_device_augment(flagship_data_recipe(2500))
        assert plan.augment is not None, plan.summary
        print(f"device_augment: {plan.summary}")
        from semi_seg_ecg_tpu.algorithms.fixmatch import make_train_step
        from semi_seg_ecg_tpu.models import build_model_from_config
        from semi_seg_ecg_tpu.utils.optimizer import build_optimizer
        from __graft_entry__ import _flagship_config

        config = _flagship_config(signal_length=2500,
                                  batch_per_replica=batch)
        model = build_model_from_config(config, train=True)
        tx = build_optimizer(config, None, steps_per_epoch=1000, model=model)
        step = make_train_step(model, tx, config, 1000)
        aug = plan.augment

        def fused(s, b):
            key = jax.random.fold_in(jax.random.key(0x5EED), s.step)
            return step(s, aug(key, b))

        # bench._build ships a FusedTrainState (small-leaf packing); the
        # raw train step reads plain TrainState fields, so the same
        # adapter the bench uses must wrap the aug+step composition
        from semi_seg_ecg_tpu.utils.fused_state import (
            FusedTrainState, wrap_step,
        )

        if isinstance(state, FusedTrainState):
            fused = wrap_step(fused, state.meta)
        compiled = jax.jit(fused, donate_argnums=0).lower(
            state, run_batch).compile()
    calls = max(steps // max(scan_k, 1), 1)

    def leaf(s):
        return jax.tree.leaves(s.model.params)[0]

    for _ in range(3):  # warmup
        state, _ = compiled(state, run_batch)
    jax.block_until_ready(leaf(state))

    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(calls):
            state, _ = compiled(state, run_batch)
        jax.block_until_ready(leaf(state))
        wall = time.perf_counter() - t0
    return wall / (calls * max(scan_k, 1)), calls


def capture_inference(steps: int, logdir: str, batch: int = 256,
                      int8: bool = False, static: bool = False):
    """Trace the serving forward (eval-mode flagship + softmax) — the
    program tools/bench_inference.py times; returns wall s/call.

    The round-3 verdict's open question: float serving measured 65k
    samples/s ~ 0.30 MFU at batch 256 with no kernel-level attribution —
    this capture answers whether that is the forward's roofline or a
    fixable layout/fusion problem."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms.common import init_model_state
    from semi_seg_ecg_tpu.models import build_model_from_config

    config = _flagship_config()
    if int8:
        config["quantize"] = "int8"
    model = build_model_from_config(config, train=False, serving=True)
    state = init_model_state(model, config, 0)

    quant = None
    if static:
        assert int8, "--static profiles the calibrated int8 graph"
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
    x = jnp.asarray(rng.standard_normal((batch, 1, 2500)), jnp.float32)
    for _ in range(3):
        out = infer(state.params, state.batch_stats, x)
    jax.block_until_ready(out)

    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = infer(state.params, state.batch_stats, x)
        float(out[0, 0, 0])  # value-fetch barrier (tunnel discipline)
        wall = time.perf_counter() - t0
    return wall / steps, steps


def capture_holter(steps: int, logdir: str, hours: float = 1.0,
                   batch: int = 256, hop: int = 2500, int8: bool = False):
    """Trace the long-record stitcher (ops/stitch.py) end to end — the
    program tools/bench_holter.py times. Attributes the gap between the
    stitched per-window cost and the pure windowed forward (window
    materialization, standardize reductions, overlap fold, accumulator
    traffic, final normalize/argmax)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms.common import init_model_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.ops.stitch import overlap_add_infer
    from tools.bench_holter import synth_record

    config = _flagship_config()
    if int8:
        config["quantize"] = "int8"
    model = build_model_from_config(config, train=False, serving=True)
    state = init_model_state(model, config, 0)
    quant = None
    if int8:
        from semi_seg_ecg_tpu.utils.calibrate import calibrate_quant

        cal_rng = np.random.default_rng(1)
        quant = calibrate_quant(
            model, state.params, state.batch_stats,
            (jnp.asarray(cal_rng.standard_normal((16, 1, 2500)),
                         jnp.float32) for _ in range(4)))

    def infer(x):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, x, train=False)
        return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=1)

    record = jnp.asarray(synth_record(hours))
    _, labels = overlap_add_infer(infer, record, window=2500, hop=hop,
                                  batch=batch)
    jax.block_until_ready(labels)

    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(steps):
            _, labels = overlap_add_infer(infer, record, window=2500,
                                          hop=hop, batch=batch)
        float(labels[0])
        wall = time.perf_counter() - t0
    return wall / steps, steps


def tool_rows(logdir: str, tool: str):
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir} — trace capture "
                         "failed (remote-tunnel limitation?)")
    data, _ctype = rtd.xspace_to_tool_data(paths, tool, {})
    return _rows_from_gviz(data)


def _num(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return 0.0


def report_hlo_stats(rows, steps_traced: int, wall_per_step_us: float,
                     top: int = 25):
    """hlo_stats (xprof 2.21 column ids: hlo_op_name / category /
    occurrences / total_self_time / model_flop_rate /
    operational_intensity / bound_by) → per-step kernel table + rollup."""
    ops = []
    for r in rows:
        name = r.get("hlo_op_name")
        if not name:
            continue
        ops.append((
            name,
            r.get("category") or "?",
            _num(r.get("occurrences")),
            _num(r.get("total_self_time")),
            _num(r.get("model_flop_rate")),
            _num(r.get("operational_intensity")),
            r.get("bound_by") or "",
        ))
    ops.sort(key=lambda t: -t[3])
    device_total = sum(t[3] for t in ops)
    per_step_busy = device_total / max(steps_traced, 1)

    print(f"\n{'kernel':48s} {'category':20s} {'n/st':>5s} "
          f"{'us/st':>8s} {'%':>6s} {'GFLOP/s':>9s} {'FLOP/B':>7s} bound")
    for name, cat, occ, self_t, flops, oi, bound in ops[:top]:
        print(f"{name[:48]:48s} {cat[:20]:20s} "
              f"{occ / max(steps_traced, 1):5.1f} "
              f"{self_t / max(steps_traced, 1):8.1f} "
              f"{100 * self_t / max(device_total, 1e-9):6.2f} "
              f"{flops:9.1f} {oi:7.1f} {bound}")

    cats = {}
    for _, cat, _, self_t, *_ in ops:
        cats[cat] = cats.get(cat, 0.0) + self_t
    print("\ncategory rollup (us/step):")
    for cat, total in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:30s} {total / max(steps_traced, 1):9.1f} "
              f"{100 * total / max(device_total, 1e-9):6.2f}%")

    print(f"\ndevice-busy: {per_step_busy:.1f} us/step | wall: "
          f"{wall_per_step_us:.1f} us/step | gap (dispatch/idle): "
          f"{wall_per_step_us - per_step_busy:.1f} us/step")
    return ops, per_step_busy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--scan", type=int, default=0,
                    help="profile the lax.scan K-step program instead")
    ap.add_argument("--augment", action="store_true",
                    help="profile the cache-mode fused program (device "
                         "augmentation chain + train step)")
    ap.add_argument("--batch", type=int, default=16,
                    help="per-replica batch (the bench_scale sweep showed "
                         "a >=128 falloff — trace it at that size)")
    ap.add_argument("--inference", action="store_true",
                    help="profile the serving forward (eval-mode flagship "
                         "+ softmax) instead of the train step")
    ap.add_argument("--holter", action="store_true",
                    help="profile the long-record stitcher (ops/stitch.py) "
                         "on a 1 h record instead of the train step")
    ap.add_argument("--hop", type=int, default=2500,
                    help="with --holter: window stride")
    ap.add_argument("--int8", action="store_true",
                    help="with --inference: the dynamically quantized model")
    ap.add_argument("--static", action="store_true",
                    help="with --int8: calibrated static activation scales")
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None,
                    help="trace dir (default: temp, deleted unless --keep)")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars are too late on "
                         "this image — jax is pre-imported by sitecustomize)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    logdir = args.out or tempfile.mkdtemp(prefix="jaxprof_")
    try:
        if args.holter:
            wall_per_step, calls = capture_holter(
                max(1, min(args.steps, 5)), logdir, batch=args.batch,
                hop=args.hop, int8=args.int8)
        elif args.inference:
            wall_per_step, calls = capture_inference(
                args.steps, logdir, batch=args.batch, int8=args.int8,
                static=args.static)
        else:
            wall_per_step, calls = capture(args.steps, args.scan, logdir,
                                           augment=args.augment,
                                           batch=args.batch)
        steps_traced = calls * max(args.scan, 1)
        label = (("int8-" if args.int8 else "") + "holter-record"
                 if args.holter
                 else ("int8-" if args.int8 else "") + "inference"
                 if args.inference
                 else f"scan{args.scan}" if args.scan > 1
                 else "augment+step" if args.augment else "per-step")
        print(f"[{label}] traced {steps_traced} steps "
              f"({calls} dispatches), wall {wall_per_step * 1e6:.1f} us/step")
        rows = tool_rows(logdir, args.tool)
        if args.tool == "hlo_stats":
            report_hlo_stats(rows, steps_traced, wall_per_step * 1e6,
                             args.top)
        else:
            print(json.dumps(rows[:args.top], indent=2, default=str))
    finally:
        if not args.keep and args.out is None:
            shutil.rmtree(logdir, ignore_errors=True)
        elif args.keep:
            print(f"trace kept at {logdir}")


if __name__ == "__main__":
    main()
