"""Long-record (Holter-scale) training capability: measure, don't assert.

The reference's attention is dense O(N^2) softmax
(/root/reference/src/models/backbones/vision_transformer.py:129-132) and
its only distribution is DDP (src/main_train.py:64-101) — batch-axis
sharding cannot cut the per-*sample* activation footprint, so a record
that does not fit one GPU does not fit at all. Our answer is sequence
parallelism (parallel/mesh.py: time axis sharded over a ``seq`` mesh
axis) + ring attention (ops/ring_attention.py). This harness produces the
evidence for that claim at Holter scale (T >= 65,536 samples):

1. ``--mem``: per-device compiled memory (``memory_analysis()``) of the
   FULL ViT train step at fixed global batch for seq_parallel s in
   {1, 2, 4, 8} — s=1 runs the dense path (what a single device without
   SP must do; the reference's algorithm), s>1 the ring. The ring
   column must scale ~1/s.
2. ``--parity``: executes real optimizer steps at T>=65,536 on the
   8-device CPU mesh, ring+SP vs single-device dense, and checks the
   loss trajectories and final params agree.
3. ``--crossover``: compiles a flagship-sized ViT at a larger T and
   reports which side of a single device's HBM budget (default 16 GB,
   v5e) each s lands on: the table's point is a T where s=1 cannot fit
   and s=8 comfortably can.
4. ``--tpu``: one real long-T training run on the attached chip
   (single-chip path: Pallas flash attention + remat), reporting wall
   time per step — the longest record the chip itself can train.

CPU modes force the virtual 8-device mesh (tests/conftest.py pattern);
compile-only measurements never execute the s=1 giant, so the host does
not need the memory the table reports.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu(n=8):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    return jax


def make_config(t, s, impl, *, depth, width, heads, dim_head, mlp_dim,
                batch, remat=False, precision="fp32", patch=16):
    """Supervised ViT+FCN recipe at signal length ``t`` under seq_parallel
    ``s`` (algorithm: base — the memory story is the same for all six)."""
    fp16 = precision != "fp32"
    return {
        "seed": 0, "algorithm": "base", "mode": "scratch",
        "use_amp": fp16, "precision": precision,
        "dataset": {"signal_length": t},
        "backbone": {"vit_tiny": {
            "seq_len": t, "patch_size": patch, "num_leads": 1,
            "fp16_enabled": fp16, "width": width, "depth": depth,
            "heads": heads, "dim_head": dim_head, "mlp_dim": mlp_dim,
            "attention_impl": impl, "remat": remat,
            "out_indices": (depth - 1,),
        }},
        "decode_head": {"FCNHead": {
            "in_channels": width, "in_index": 0, "channels": 32,
            "num_convs": 1, "concat_input": False, "dropout_ratio": 0.0,
            "num_classes": 4, "align_corners": False,
        }},
        "train": {"epochs": 2, "accum_iter": 1, "warmup_epochs": 0,
                  "min_lr": 1e-4, "blr": None, "lr": 1e-3,
                  "weight_decay": 0.05, "max_norm": None,
                  "layer_decay": None, "optimizer": "adamw",
                  "optimizer_kwargs": {"betas": [0.9, 0.999]}},
        "dataloader": {"batch_size": batch},
        "parallel": {"model_parallel": 1, "seq_parallel": s},
    }


def build(cfg, devices):
    """(mesh, replicated state, jitted step, shard_batch fn) for a config."""
    import jax
    from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import (
        make_mesh, replicated, shard_batch)
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    mesh = make_mesh(cfg, devices=devices)
    model = build_model_from_config(cfg, train=True)
    tx = build_optimizer(cfg, None, 10, model=model)
    state = jax.device_put(build_state(cfg, model, tx, SPEC, seed=0),
                           replicated(mesh))
    step = jax.jit(make_train_step(model, tx, cfg, 10))
    return mesh, state, step, lambda b: shard_batch(mesh, b)


def _batch(t, n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ecg": rng.standard_normal((n, 1, t)).astype(np.float32),
        "target": rng.integers(0, 4, (n, t)).astype(np.int32),
    }


def _mem_row(cfg, devices, batch):
    """Compile (never execute) the step and read XLA's memory analysis.

    Fully abstract lowering: ``jax.eval_shape`` for the state and
    ``ShapeDtypeStruct`` + NamedSharding for the batch, so nothing —
    not even flax ``init``'s forward pass — ever runs at these shapes;
    the host does not need the memory the table reports."""
    import jax
    from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import (
        DATA_AXIS, _array_sharding, make_mesh, replicated, set_current_mesh)
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer
    try:
        mesh = make_mesh(cfg, devices=devices)
        model = build_model_from_config(cfg, train=True)
        tx = build_optimizer(cfg, None, 10, model=model)
        rep = replicated(mesh)
        state_abs = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
            jax.eval_shape(
                lambda: build_state(cfg, model, tx, SPEC, seed=0)))
        batch_abs = {
            k: jax.ShapeDtypeStruct(
                v.shape, v.dtype,
                sharding=_array_sharding(mesh, v, (DATA_AXIS,)))
            for k, v in batch.items()
        }
        step = jax.jit(make_train_step(model, tx, cfg, 10))
        lowered = step.lower(state_abs, batch_abs)
        t0 = time.time()
        ma = lowered.compile().memory_analysis()
        return {
            "temp_bytes": int(ma.temp_size_in_bytes),
            "arg_bytes": int(ma.argument_size_in_bytes),
            "out_bytes": int(ma.output_size_in_bytes),
            "compile_s": round(time.time() - t0, 1),
        }
    finally:
        set_current_mesh(None)


def _gb(b):
    return b / (1 << 30)


def run_mem(args):
    jax = _cpu(8)
    devs = jax.devices()
    t = args.t
    batch = _batch(t, args.batch)
    rows = []
    for s in args.s_list:
        impl = "ring" if s > 1 else "xla"  # s=1: the dense single-device path
        cfg = make_config(
            t, s, impl, depth=args.depth, width=args.width, heads=args.heads,
            dim_head=args.dim_head, mlp_dim=args.mlp_dim, batch=args.batch,
            remat=args.remat)
        r = _mem_row(cfg, devs[:s], batch)
        r.update(s=s, impl=impl)
        rows.append(r)
        print(f"s={s} ({impl:4s}): temp {_gb(r['temp_bytes']):8.3f} GB  "
              f"args {_gb(r['arg_bytes']):6.3f} GB  "
              f"out {_gb(r['out_bytes']):6.3f} GB  "
              f"[compile {r['compile_s']}s]", flush=True)
    ring = [r for r in rows if r["impl"] == "ring"]
    for a, b in zip(ring, ring[1:]):
        ratio = b["temp_bytes"] / a["temp_bytes"]
        print(f"  ring temp s={b['s']} / s={a['s']} = {ratio:.3f} "
              f"(ideal 0.5)")
    print(json.dumps({"mode": "mem", "t": t, "batch": args.batch,
                      "depth": args.depth, "width": args.width,
                      "remat": args.remat, "rows": rows}))
    return rows


def run_parity(args):
    jax = _cpu(8)
    devs = jax.devices()
    from semi_seg_ecg_tpu.parallel.mesh import set_current_mesh
    t = args.t
    kw = dict(depth=args.depth, width=args.width, heads=args.heads,
              dim_head=args.dim_head, mlp_dim=args.mlp_dim,
              batch=args.batch)
    batches = [_batch(t, args.batch, seed=i) for i in range(args.steps)]

    def run(cfg, devices):
        try:
            _, state, step, shard = build(cfg, devices)
            losses, times = [], []
            for b in batches:
                sb = shard(b)
                t0 = time.time()
                state, m = step(state, sb)
                loss = float(m["loss"])  # blocks
                times.append(time.time() - t0)
                losses.append(loss)
            return state, losses, times
        finally:
            set_current_mesh(None)

    s = args.s_list[-1]
    print(f"T={t} ({t // 16} patch tokens), {args.steps} steps, "
          f"ring seq_parallel={s} vs single-device dense", flush=True)
    sp_state, sp_loss, sp_t = run(make_config(t, s, "ring", **kw), devs[:s])
    print(f"  ring s={s}: losses {['%.6f' % x for x in sp_loss]} "
          f"({[round(x, 1) for x in sp_t]}s)", flush=True)
    d_state, d_loss, d_t = run(make_config(t, 1, "xla", **kw), devs[:1])
    print(f"  dense s=1: losses {['%.6f' % x for x in d_loss]} "
          f"({[round(x, 1) for x in d_t]}s)", flush=True)

    np.testing.assert_allclose(sp_loss, d_loss, rtol=2e-4)
    worst = 0.0
    for a, b in zip(jax.tree.leaves(sp_state.model.params),
                    jax.tree.leaves(d_state.model.params)):
        worst = max(worst, float(np.max(np.abs(np.asarray(a)
                                               - np.asarray(b)))))
    print(f"  PARITY OK: losses rtol<=2e-4; max |param diff| after "
          f"{args.steps} steps = {worst:.2e}")
    print(json.dumps({"mode": "parity", "t": t, "s": s,
                      "steps": args.steps, "ring_losses": sp_loss,
                      "dense_losses": d_loss, "max_param_diff": worst}))


def run_crossover(args):
    jax = _cpu(8)
    devs = jax.devices()
    t = args.t_big
    budget = args.budget_gb * (1 << 30)
    batch = _batch(t, args.batch)
    print(f"T={t} ({t // 16} tokens), flagship ViT depth={args.depth} "
          f"width={args.width} batch={args.batch} remat={args.remat}; "
          f"budget {args.budget_gb} GB/device", flush=True)
    rows = []
    for s in (1, args.s_list[-1]):
        impl = "ring" if s > 1 else "xla"
        cfg = make_config(
            t, s, impl, depth=args.depth, width=args.width,
            heads=args.heads, dim_head=args.dim_head, mlp_dim=args.mlp_dim,
            batch=args.batch, remat=args.remat)
        r = _mem_row(cfg, devs[:s], batch)
        r.update(s=s, impl=impl,
                 fits=(r["temp_bytes"] + r["arg_bytes"]) < budget)
        rows.append(r)
        print(f"s={s} ({impl:4s}): temp {_gb(r['temp_bytes']):10.2f} GB  "
              f"args {_gb(r['arg_bytes']):6.2f} GB  -> "
              f"{'FITS' if r['fits'] else 'EXCEEDS'} budget", flush=True)
    print(json.dumps({"mode": "crossover", "t": t,
                      "budget_gb": args.budget_gb, "rows": rows}))


def run_tpu(args):
    """One real long-T run on the attached chip: flash attention + remat.

    Single chip = seq_parallel 1, so this is the intra-chip half of the
    long-record story (the Pallas kernel's O(N) memory + remat); the
    inter-chip half (ring/SP) is the CPU-mesh tables above.
    """
    import jax
    from semi_seg_ecg_tpu.parallel.mesh import set_current_mesh
    t = args.t
    print(f"devices: {jax.devices()}", flush=True)
    cfg = make_config(
        t, 1, "auto", depth=args.depth, width=args.width, heads=args.heads,
        dim_head=args.dim_head, mlp_dim=args.mlp_dim, batch=args.batch,
        remat=True, precision="bf16")
    batch = _batch(t, args.batch)
    try:
        mesh, state, step, shard = build(cfg, jax.devices()[:1])
        sb = shard(batch)
        t0 = time.time()
        state, m = step(state, sb)
        first = float(m["loss"])
        compile_s = time.time() - t0
        times = []
        for i in range(args.steps):
            t0 = time.time()
            state, m = step(state, sb)
            jax.block_until_ready(m["loss"])
            times.append(time.time() - t0)
        wall = float(np.median(times))
        tokens = t // 16 + 1
        print(f"T={t} ({tokens} tokens) depth={args.depth} "
              f"width={args.width} batch={args.batch}: first step "
              f"{compile_s:.1f}s (compile), then {wall * 1e3:.0f} ms/step, "
              f"loss {float(m['loss']):.4f}")
        print(json.dumps({"mode": "tpu", "t": t, "batch": args.batch,
                          "depth": args.depth, "width": args.width,
                          "ms_per_step": round(wall * 1e3, 1),
                          "first_loss": first}))
    finally:
        set_current_mesh(None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["mem", "parity", "crossover", "tpu"],
                   default="mem")
    p.add_argument("--t", type=int, default=65536)
    p.add_argument("--t-big", type=int, default=2 ** 21)
    p.add_argument("--s", default="1,2,4,8")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--heads", type=int, default=3)
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--mlp-dim", type=int, default=768)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--budget-gb", type=float, default=16.0)
    args = p.parse_args()
    args.s_list = [int(x) for x in args.s.split(",")]
    {"mem": run_mem, "parity": run_parity,
     "crossover": run_crossover, "tpu": run_tpu}[args.mode](args)


if __name__ == "__main__":
    main()
