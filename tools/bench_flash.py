"""Pallas flash attention vs XLA attention, forward and fwd+bwd.

Reproduces the NOTES.md round-1 measurement (v5e, n=2048, b=8, h=12,
d=64, bf16: forward 2.6x, fwd+bwd 2.9x vs the XLA-fused reference
attention). Slope-timed with a value-fetch barrier (bench.py machinery),
so the remote-tunnel dispatch noise cancels.

The kernel refuses shapes whose K/V-resident working set would overflow
VMEM (``flash_attention.fits_vmem``) — this tool checks first rather than
risk wedging the remote TPU backend (NOTES.md "Environment pitfalls").

Run: ``python tools/bench_flash.py [--n 2048 --batch 8 --heads 12 --d 64]``.
Prints one JSON line.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _time(fn, args, calls, label):
    import jax

    compiled = jax.jit(fn).lower(*args).compile()

    class _Shim:
        """Adapt (q,k,v) -> scalar programs to bench._measure's
        (state, batch) -> (state, {'loss': leaf}) contract."""

        def __call__(self, state, batch):
            return state, {"loss": compiled(*args)}

    dt, _, barrier = bench._measure(_Shim(), 0, None, calls)
    return dt / calls, barrier


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--calls", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import importlib

    # the ops.pallas package re-exports the flash_attention *function*,
    # shadowing the submodule for plain attribute imports
    fa = importlib.import_module(
        "semi_seg_ecg_tpu.ops.pallas.flash_attention")

    if not fa.fits_vmem(args.n, args.d):
        print(json.dumps({"error": "shape exceeds the kernel's VMEM budget",
                          "n": args.n, "d": args.d}))
        return

    link = bench.probe_link()
    interpret = jax.default_backend() != "tpu"  # same rule as the model
    rng = np.random.default_rng(0)
    shape = (args.batch, args.heads, args.n, args.d)
    q, k, v = (jax.device_put(
        rng.standard_normal(shape).astype(np.float32) / args.d**0.25
    ).astype(jnp.bfloat16) for _ in range(3))
    scale = 1.0 / args.d**0.5

    def flash(q, k, v, s):
        return fa.flash_attention(q, k, v, s, fa.DEFAULT_BLOCK_Q,
                                  fa.DEFAULT_BLOCK_K, interpret)

    def xla_fwd(q, k, v):
        return jnp.sum(fa._reference_attention(q, k, v, scale))

    def flash_fwd(q, k, v):
        return jnp.sum(flash(q, k, v, scale))

    def loss_grads(attn):
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v, scale) ** 2)

        def fwd_bwd(q, k, v):
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(g) for g in grads)

        return fwd_bwd

    rows = {}
    for name, fn in [
        ("xla_fwd", xla_fwd),
        ("flash_fwd", flash_fwd),
        ("xla_fwd_bwd", loss_grads(fa._reference_attention)),
        ("flash_fwd_bwd", loss_grads(flash)),
    ]:
        ms, barrier = _time(fn, (q, k, v), args.calls, name)
        rows[name] = round(ms * 1e3, 3)
        print(f"# {name:14s} {ms*1e3:8.3f} ms  ({barrier})", file=sys.stderr)

    print(json.dumps({
        "metric": "flash_attention_vs_xla_ms",
        "device_kind": jax.devices()[0].device_kind,
        "shape": {"batch": args.batch, "heads": args.heads,
                  "n": args.n, "d": args.d, "dtype": "bfloat16"},
        "ms": rows,
        "speedup_fwd": round(rows["xla_fwd"] / rows["flash_fwd"], 2),
        "speedup_fwd_bwd": round(rows["xla_fwd_bwd"] / rows["flash_fwd_bwd"],
                                 2),
        "link": link,
    }))


if __name__ == "__main__":
    main()
