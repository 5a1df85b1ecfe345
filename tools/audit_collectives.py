"""Compiled collective-traffic audit per parallelism recipe.

GSPMD inserts collectives invisibly, and it has already burned this repo
once: the bare Pallas flash kernel under a mesh ran fully REPLICATED —
XLA all-gathered the inputs around the custom call — passing every
correctness test while destroying multi-chip scaling (NOTES.md "(fixed)
attention_impl: flash inside a multi-device mesh"). Nothing would catch a
recurrence: a recipe change that re-materializes a gather/all-reduce is
invisible to numerics. This tool compiles each parallelism recipe's full
train step over a virtual 8-device CPU mesh (identical GSPMD passes to a
real TPU slice), parses the optimized HLO, and reports every collective
op with shapes and byte totals; tests/test_collectives_audit.py pins the
expected signature per recipe.

The reference trusts NCCL blindly (DDP backward hooks + concat_all_gather,
reference src/utils/misc.py:209-233,335-350) — it has no analogue of this
audit; the capability being transcended is "the collectives are whatever
the framework inserted".

Run: ``python tools/audit_collectives.py [--out bench_logs/collectives_audit.json]``
(CPU-only; needs no TPU link).
"""

import argparse
import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEVICES = 8
SIG_LEN = 320
BATCH_PER_REPLICA = 2

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all", "collective-broadcast")

# one result type: f32[2,8,320]{2,1,0} or scalar f32[]
_TYPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:{[^}]*})?")
_LINE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?(?P<name>[\w.\-]+)\s*=\s*(?P<types>.*?)\s+"
    r"(?P<op>" + "|".join(_COLLECTIVES) + r")(?P<variant>-start|-done)?\(")


def _type_bytes(type_str):
    """Total bytes of one HLO type string (tuple types sum elements)."""
    total = 0
    for dtype, dims in _TYPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue  # token/opaque types
        n = 1
        if dims:
            n = math.prod(int(d) for d in dims.split(","))
        total += n * _DTYPE_BYTES[dtype]
    return total


def parse_collectives(hlo_text):
    """Optimized-HLO text -> list of {op, name, bytes, type} dicts.

    Async pairs are counted once: ``-start`` marks the op (its result type
    includes aliased operands + context, so bytes come from the matching
    ``-done``); sync ops are taken directly.
    """
    ops = []
    started = {}
    for line in hlo_text.splitlines():
        m = _LINE_RE.match(line)
        if not m:
            continue
        name, types, op, variant = (m.group("name"), m.group("types"),
                                    m.group("op"), m.group("variant"))
        if variant == "-start":
            started[name] = op
            ops.append({"op": op, "name": name, "bytes": None,
                        "type": types})
        elif variant == "-done":
            # find the start this done completes (operand name in parens)
            for rec in reversed(ops):
                if rec["bytes"] is None and rec["op"] == op:
                    rec["bytes"] = _type_bytes(types)
                    rec["type"] = types
                    break
        else:
            ops.append({"op": op, "name": name,
                        "bytes": _type_bytes(types), "type": types})
    for rec in ops:
        if rec["bytes"] is None:  # start without a parsed done
            rec["bytes"] = _type_bytes(rec["type"])
    return ops


def summarize(ops):
    out = {}
    for rec in ops:
        s = out.setdefault(rec["op"], {"count": 0, "bytes": 0,
                                       "largest": 0})
        s["count"] += 1
        s["bytes"] += rec["bytes"]
        s["largest"] = max(s["largest"], rec["bytes"])
    return out


def _tree_bytes(tree):
    import jax

    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree)
               if hasattr(l, "dtype"))


def _build(config, spec_mod, mesh, zero1=False):
    import jax
    import numpy as np

    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import batch_sharding, replicated
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, steps_per_epoch=10, model=model)
    state = build_state(config, model, tx, spec_mod.SPEC, seed=0)
    if zero1:
        from semi_seg_ecg_tpu.parallel.sharding_rules import (
            shard_state, state_shardings,
        )

        state = shard_state(mesh, state, shard_optimizer=True)
        shardings = state_shardings(mesh, state, shard_optimizer=True)
        inner = spec_mod.make_train_step(model, tx, config, 10)

        def step(s, b):
            ns, m = inner(s, b)
            return jax.lax.with_sharding_constraint(ns, shardings), m
    else:
        from semi_seg_ecg_tpu.parallel.sharding_rules import shard_state

        if (config.get("parallel") or {}).get("model_parallel", 1) > 1:
            state = shard_state(mesh, state)
        else:
            state = jax.device_put(state, replicated(mesh))
        step = spec_mod.make_train_step(model, tx, config, 10)

    dp = math.prod(v for k, v in mesh.shape.items() if k != "model")
    global_batch = BATCH_PER_REPLICA * dp
    rng = np.random.default_rng(0)
    batch = {
        "ecg": rng.standard_normal(
            (global_batch, 1, SIG_LEN)).astype("float32"),
        "target": rng.integers(0, 4, (global_batch, SIG_LEN)),
    }
    if config["algorithm"] == "fixmatch":
        batch["ecg_u_w"] = rng.standard_normal(
            (global_batch, 1, SIG_LEN)).astype("float32")
        batch["ecg_u_s"] = rng.standard_normal(
            (global_batch, 1, SIG_LEN)).astype("float32")
    if "seq" in mesh.shape and mesh.shape["seq"] > 1:
        from semi_seg_ecg_tpu.parallel.mesh import shard_batch

        batch = shard_batch(mesh, batch)
    else:
        batch = jax.device_put(batch, batch_sharding(mesh))
    compiled = jax.jit(step, donate_argnums=0).lower(state, batch).compile()
    return compiled, {"param_bytes": _tree_bytes(state.model.params),
                      "opt_bytes": _tree_bytes(state.opt_state)}


def audit_recipe(name, n_devices=N_DEVICES):
    """Compile one named recipe; returns (ops, summary, context)."""
    import jax

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms import base as base_algo
    from semi_seg_ecg_tpu.algorithms import fixmatch as fixmatch_algo
    from semi_seg_ecg_tpu.parallel.mesh import make_mesh

    devices = jax.devices()[:n_devices]
    config = _flagship_config(signal_length=SIG_LEN,
                              batch_per_replica=BATCH_PER_REPLICA)
    zero1 = False
    spec_mod = fixmatch_algo
    if name == "dp":
        pass
    elif name == "zero1":
        zero1 = True
    elif name == "dp_tp_vit_flash":
        spec_mod = base_algo
        config["algorithm"] = "base"
        config["backbone"] = {
            "vit_tiny": {"seq_len": SIG_LEN, "patch_size": 16,
                         "num_leads": 1, "fp16_enabled": True, "heads": 4,
                         "attention_impl": "flash"}}
        config["decode_head"]["FCNHead"]["in_channels"] = 192
        config["parallel"] = {"model_parallel": 2}
    elif name == "dp_sp_ring":
        spec_mod = base_algo
        config["algorithm"] = "base"
        config["backbone"] = {
            "vit_tiny": {"seq_len": SIG_LEN, "patch_size": 16,
                         "num_leads": 1, "fp16_enabled": True, "heads": 4,
                         "attention_impl": "ring"}}
        config["decode_head"]["FCNHead"]["in_channels"] = 192
        config["parallel"] = {"model_parallel": 1, "seq_parallel": 2}
    else:
        raise ValueError(f"unknown recipe {name}")
    mesh = make_mesh(config, devices=devices)
    compiled, ctx = _build(config, spec_mod, mesh, zero1=zero1)
    ops = parse_collectives(compiled.as_text())
    ctx["mesh"] = dict(mesh.shape)
    return ops, summarize(ops), ctx


RECIPES = ("dp", "zero1", "dp_tp_vit_flash", "dp_sp_ring")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipes", nargs="+", default=list(RECIPES))
    ap.add_argument("--devices", type=int, default=N_DEVICES)
    ap.add_argument("--out", default="bench_logs/collectives_audit.json")
    ap.add_argument("--verbose", action="store_true",
                    help="print every collective op, not just the summary")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_num_cpu_devices", args.devices)
    jax.config.update("jax_platforms", "cpu")

    report = {}
    for name in args.recipes:
        ops, summary, ctx = audit_recipe(name, args.devices)
        report[name] = {"summary": summary, "context": ctx,
                        "ops": ops if args.verbose else None}
        print(f"=== {name} (mesh {ctx['mesh']}, params "
              f"{ctx['param_bytes']/1e6:.2f} MB) ===")
        for op, s in sorted(summary.items()):
            print(f"  {op:20s} x{s['count']:<4d} total "
                  f"{s['bytes']/1e6:8.2f} MB   largest "
                  f"{s['largest']/1e6:8.2f} MB")
        if not summary:
            print("  (no collectives)")
        if args.verbose:
            for rec in ops:
                print(f"    {rec['op']:20s} {rec['bytes']/1e6:8.3f} MB  "
                      f"{rec['type']}")
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
