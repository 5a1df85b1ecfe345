"""Spike: the B>=128 layer1 dgrad falloff (VERDICT r3 #7).

The round-3 trace (NOTES.md batch-falloff) showed that from B=128 XLA
compiles the input-grad of layer1's 3-wide 64-channel conv (T=625) into
an HBM-bound kOutput fusion with three (B,625,64) bf16 outputs in a
transposed {0,2,1} layout — 17-21 TFLOP/s vs 170-190 for every other
conv, 2.5x per-sample cost doubling B. Declared "not fixable from JAX
without a custom dgrad kernel"; this spike is the honest shot before
that stands.

Reproduces layer1 in isolation — two BasicBlocks at (B, 625, 64) bf16
(conv3-bn-relu-conv3-bn-add-relu, BN folded to scale/shift with real
grads so the bwd has the same elementwise neighbourhood the fusion
merged) — and times fwd+bwd under three conv implementations:

- ``xla``     : plain ``lax.conv_general_dilated`` + autodiff (status quo;
                the transposed-kOutput choice should reproduce at B>=128).
- ``custom``  : ``jax.custom_vjp`` — dx as an explicit same-pad NWC conv
                of gy with the flipped/channel-swapped kernel (a forward-
                shaped conv XLA runs at ~180 TFLOP/s), dw as three shifted
                (B*T, C)x(B*T, C) einsum contractions.
- ``barrier`` : autodiff, but ``optimization_barrier`` on gy ahead of the
                conv transpose — splits the multi-output kOutput fusion
                without changing any math.

Usage:
  python tools/spike_dgrad.py [--batches 64,128,256] [--iters 24]
  python tools/spike_dgrad.py --profile --batch 256 --impl xla   # kernel table

Verdict criteria: a variant that cuts per-sample us at B=256 wins and
gets wired into ConvBN behind a flag; if none does, the measured table
IS the negative result that retires the question (NOTES.md).
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 625
C = 64
DN = ("NWC", "WIO", "NWC")


def _fwd_conv(x, w):
    import jax.lax as lax
    return lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(1, 1)], dimension_numbers=DN)


def make_conv(impl):
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    if impl == "xla":
        return _fwd_conv

    if impl == "barrier":
        @jax.custom_vjp
        def conv(x, w):
            return _fwd_conv(x, w)

        def fwd(x, w):
            return _fwd_conv(x, w), (x, w)

        def bwd(res, gy):
            x, w = res
            # The barrier pins gy as a materialised fusion boundary, so
            # the conv transpose cannot be merged into a transposed
            # multi-output kOutput fusion with its elementwise neighbours.
            gy = lax.optimization_barrier(gy)
            _, vjp = jax.vjp(_fwd_conv, x, w)
            return vjp(gy)

        conv.defvjp(fwd, bwd)
        return conv

    assert impl == "custom"

    @jax.custom_vjp
    def conv(x, w):
        return _fwd_conv(x, w)

    def fwd(x, w):
        return _fwd_conv(x, w), (x, w)

    def bwd(res, gy):
        x, w = res
        k = w.shape[0]
        pad = k // 2
        # dx: a forward-shaped same-pad conv of gy with the kernel
        # flipped along taps and swapped in/out channels — the exact
        # transpose of y[t] = sum_k x[t+k-pad] W[k], but expressed as a
        # conv XLA compiles like any forward conv.
        w_t = jnp.swapaxes(w[::-1], 1, 2)
        dx = lax.conv_general_dilated(
            gy, w_t, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=DN)
        # dw[k] = sum_{b,t} x[b, t+k-pad] gy[b, t] — k big-reduction
        # (B*T, C)x(B*T, C) matmuls.
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        t_len = x.shape[1]
        dw = jnp.stack([
            jnp.einsum("btc,btd->cd", xp[:, j:j + t_len, :], gy,
                       preferred_element_type=jnp.float32)
            for j in range(k)
        ]).astype(w.dtype)
        return dx, dw

    conv.defvjp(fwd, bwd)
    return conv


def make_step(impl):
    """Two BasicBlocks (the whole of layer1) + Adam-free SGD update so the
    program has the train step's produce-grads-consume-grads shape."""
    import jax
    import jax.numpy as jnp

    conv = make_conv(impl)

    def block(p, x):
        h = conv(x, p["w1"]) * p["s1"] + p["b1"]
        h = jax.nn.relu(h)
        h = conv(h, p["w2"]) * p["s2"] + p["b2"]
        return jax.nn.relu(h + x)

    def net(params, x):
        for p in params:
            x = block(p, x)
        return x

    def loss_fn(params, x, g):
        out = net(params, x)
        return jnp.sum((out * g).astype(jnp.float32)), out

    def step(params, x, g):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, x, g)
        gp, gx = grads
        new = jax.tree.map(lambda p, d: p - 1e-3 * d.astype(p.dtype),
                           params, gp)
        # consume gx so the input grad (what flows to the stem) is live
        return new, loss + jnp.sum(gx.astype(jnp.float32) ** 2)

    return step


def init(batch, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)

    def p():
        return {
            "w1": jnp.asarray(rng.standard_normal((3, C, C)) * 0.05,
                              jnp.bfloat16),
            "w2": jnp.asarray(rng.standard_normal((3, C, C)) * 0.05,
                              jnp.bfloat16),
            "s1": jnp.ones((C,), jnp.bfloat16),
            "b1": jnp.zeros((C,), jnp.bfloat16),
            "s2": jnp.ones((C,), jnp.bfloat16),
            "b2": jnp.zeros((C,), jnp.bfloat16),
        }

    params = [p(), p()]
    x = jnp.asarray(rng.standard_normal((batch, T, C)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((batch, T, C)), jnp.bfloat16)
    return params, x, g


def _run_n(compiled, params, x, g, n):
    """n dispatches, one scalar value fetch at the end (slope component)."""
    t0 = time.perf_counter()
    for _ in range(n):
        params, s = compiled(params, x, g)
    float(s)
    return time.perf_counter() - t0, params


def measure(impl, batch, iters):
    """Slope-timed us/step (tunnel discipline: two run lengths, diff)."""
    import jax
    step = make_step(impl)
    params, x, g = init(batch)
    compiled = jax.jit(step, donate_argnums=0).lower(params, x, g).compile()
    _, params = _run_n(compiled, params, x, g, 3)  # warmup
    t1, params = _run_n(compiled, params, x, g, iters)
    t2, params = _run_n(compiled, params, x, g, 2 * iters)
    us = (t2 - t1) / iters * 1e6
    return us


def profile(impl, batch, steps, tool="hlo_stats"):
    import shutil
    import tempfile

    import jax

    from tools.profile_step import report_hlo_stats, tool_rows

    step = make_step(impl)
    params, x, g = init(batch)
    compiled = jax.jit(step, donate_argnums=0).lower(params, x, g).compile()
    _, params = _run_n(compiled, params, x, g, 3)
    logdir = tempfile.mkdtemp(prefix="jaxprof_dgrad_")
    try:
        with jax.profiler.trace(logdir):
            t0 = time.perf_counter()
            _, params = _run_n(compiled, params, x, g, steps)
            wall = (time.perf_counter() - t0) / steps
        rows = tool_rows(logdir, tool)
        report_hlo_stats(rows, steps, wall * 1e6)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def patch_all_convs_with_barrier():
    """Monkeypatch ``lax.conv_general_dilated`` so every conv's backward
    sees an ``optimization_barrier`` on the incoming cotangent — the
    generic form of the ``barrier`` variant, applied to the WHOLE model
    (spike-only; never imported by the framework)."""
    import jax
    import jax.lax as lax

    orig = lax.conv_general_dilated

    def patched(lhs, rhs, *args, **kwargs):
        if any(not hasattr(a, "ndim") for a in (lhs, rhs)):
            return orig(lhs, rhs, *args, **kwargs)

        @jax.custom_vjp
        def f(lhs, rhs):
            return orig(lhs, rhs, *args, **kwargs)

        def fwd(lhs, rhs):
            return f(lhs, rhs), (lhs, rhs)

        def bwd(res, gy):
            gy = lax.optimization_barrier(gy)
            _, vjp = jax.vjp(
                lambda l, r: orig(l, r, *args, **kwargs), *res)
            return vjp(gy)

        f.defvjp(fwd, bwd)
        return f(lhs, rhs)

    lax.conv_general_dilated = patched
    # flax resolves lax.conv_general_dilated via the module attribute at
    # call time, so the patch covers nn.Conv too
    return orig


def profile_full_step(batch, steps, barrier):
    """Kernel table for the REAL flagship train step at ``batch``, with or
    without the barrier patch — the context where the round-3 trace saw
    the transposed kOutput dgrad fusion (fusion.175)."""
    import shutil
    import tempfile

    from tools.profile_step import capture, report_hlo_stats, tool_rows

    if barrier:
        patch_all_convs_with_barrier()
    logdir = tempfile.mkdtemp(prefix="jaxprof_dgradfull_")
    try:
        wall, calls = capture(steps, 0, logdir, batch=batch)
        print(f"[full step, batch {batch}, barrier={barrier}] traced "
              f"{calls} steps, wall {wall * 1e6:.1f} us/step")
        rows = tool_rows(logdir, "hlo_stats")
        report_hlo_stats(rows, calls, wall * 1e6)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="xla,custom,barrier")
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--profile", action="store_true",
                    help="kernel table for --impl/--batch instead of timing")
    ap.add_argument("--impl", default="xla")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.profile:
        profile(args.impl, args.batch, args.steps)
        return

    impls = args.impls.split(",")
    batches = [int(b) for b in args.batches.split(",")]
    out = {}
    print(f"{'batch':>6s} " + " ".join(f"{i:>12s}" for i in impls)
          + "   (us/step | us/sample)")
    for b in batches:
        row = {}
        for impl in impls:
            us = measure(impl, b, args.iters)
            row[impl] = round(us, 1)
        out[b] = row
        print(f"{b:6d} " + " ".join(
            f"{row[i]:8.1f}/{row[i] / b:4.2f}" for i in impls), flush=True)
    print(json.dumps({"t": T, "c": C, "rows": out}))


if __name__ == "__main__":
    main()
