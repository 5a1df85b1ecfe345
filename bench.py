"""Headline benchmark: FixMatch ResNet18-1D training throughput per chip.

Workload matches the reference's north-star recipe shape (FixMatch,
configs/base/resnet18/fixmatch.yaml: batch 16, signal length 2500, AdamW,
bf16 compute): each timed step = eval-mode pseudo-label forward on the weak
unlabeled view + train forward on concat(labeled, strong) + backward +
optimizer update — all one jitted XLA program.

Baseline: the measured PyTorch-CPU equivalent (tools/bench_torch_baseline.py;
see BASELINE.md) — the reference repo publishes no numbers (SURVEY §6).

Tunnel-proofing (VERDICT r2 #2): the remote-TPU link's dispatch latency and
D2H bandwidth degrade independently of the hardware (NOTES.md "Environment
pitfalls"), so the bench (a) probes link health first and reports it in the
JSON line, (b) times with the slope method — T(2N)−T(N) sequential calls,
blocking on a single param leaf — which cancels the blocking RTT and the
fixed warmup the old one-shot window absorbed into the rate, and (c) when
dispatch is degraded, also measures the ``lax.scan`` K-steps-per-dispatch
program and reports whichever is faster (per-step wins on a healthy link,
scan amortises a congested one — both regimes measured in NOTES.md).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}``
"""

import json
import os
import time

import numpy as np

# Measured on this machine via tools/bench_torch_baseline.py (torch 2.13 CPU,
# batch 16, len 2500): 4.74 samples/sec. Override with env if re-measured.
BASELINE_SAMPLES_PER_SEC = float(
    os.environ.get("BASELINE_SAMPLES_PER_SEC", "4.74")
)
BASELINE_PROVENANCE = {
    "value": BASELINE_SAMPLES_PER_SEC,
    "unit": "samples/sec",
    "workload": "FixMatch ResNet18-1D train step, batch 16, len 2500",
    "tool": "tools/bench_torch_baseline.py",
    "measured_on": ("env:BASELINE_SAMPLES_PER_SEC"
                    if "BASELINE_SAMPLES_PER_SEC" in os.environ
                    else "torch 2.13 CPU, this image, 2026-08 (BASELINE.md)"),
}

# Peak dense bf16 FLOP/s per chip by device kind, for the MFU estimate
# (public TPU spec sheets; v5e = 197 TF bf16).
_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

# Healthy-link reference points measured on this setup (NOTES.md): dispatch
# ~0.2-0.3 ms/call, D2H tens of MB/s. Breaching these marks the run degraded.
_DISPATCH_HEALTHY_MS = 1.0
_D2H_HEALTHY_MBPS = 1.0

# completion-barrier scalar fetch gives up (and degrades to
# block_until_ready slope timing) after this long — tests shrink it
_FETCH_TIMEOUT_S = 120.0


def _flops_per_call(compiled) -> float:
    """XLA-reported FLOPs for one compiled step (0.0 if unavailable)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def probe_link():
    """H2D bandwidth, dispatch latency, D2H bandwidth through the (possibly
    remote) device link. D2H is probed in stages — 16 KB first — so a
    collapsed path (~KB/s, NOTES.md) costs seconds, not minutes."""
    import jax

    dev = jax.devices()[0]
    out = {}

    x = np.random.default_rng(0).standard_normal((256, 1024)).astype(
        np.float32)  # 1 MB
    t0 = time.perf_counter()
    xd = jax.device_put(x, dev)
    xd.block_until_ready()
    out["h2d_mbps"] = round(1.0 / (time.perf_counter() - t0), 1)

    f = jax.jit(lambda a: a + 1.0)
    y = f(xd)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(y)
    y.block_until_ready()
    out["dispatch_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)

    # D2H, staged + thread-timeout-guarded: a fully wedged path (observed:
    # 16 KB not returning within 100 s) must cost the bench seconds, not
    # hang it. A timed-out fetch reports 0 MB/s; its daemon thread drains
    # whenever the link does.
    import threading

    def timed_fetch(arr, timeout_s):
        box = {}

        def work():
            t0 = time.perf_counter()
            np.asarray(arr)
            box["dt"] = time.perf_counter() - t0

        th = threading.Thread(target=work, daemon=True)
        th.start()
        th.join(timeout_s)
        return box.get("dt")

    warm = y[:1, :4]  # 16 bytes
    warm.block_until_ready()
    small = y[:4]  # 16 KB
    small.block_until_ready()
    out.update(_staged_d2h_probe(timed_fetch, warm, small, y))

    out["healthy"] = (out["dispatch_ms"] < _DISPATCH_HEALTHY_MS
                      and out["d2h_mbps"] > _D2H_HEALTHY_MBPS)
    return out


def _staged_d2h_probe(timed_fetch, warm, small, big):
    """The D2H staging policy, separated from device plumbing so the
    misclassification modes are unit-testable (tests/test_bench_measure.py).

    The FIRST device→host fetch of a process can wedge for 35 s to >9 min
    while every later fetch runs at full speed (observed 2026-08-20,
    NOTES.md "first-fetch handshake") — for five sessions that state was
    misclassified as a dead link by a 5 s first-fetch probe. So: pay the
    handshake on a 16-byte fetch with a generous budget
    (``ECG_D2H_HANDSHAKE_TIMEOUT_S``, default 120 s) and report its
    duration; only a handshake that never returns is reported as 0 MB/s.
    Steady-state is then measured 16 KB first, so a collapsed-but-alive
    path (~KB/s) costs seconds, and the 1 MB fetch only runs when the
    small probe looked healthy."""
    out = {}
    t_warm = timed_fetch(
        warm, float(os.environ.get("ECG_D2H_HANDSHAKE_TIMEOUT_S", "120")))
    out["d2h_first_fetch_s"] = (round(t_warm, 3) if t_warm is not None
                                else None)

    dt_small = timed_fetch(small, 5.0) if t_warm is not None else None
    if dt_small is None:
        out["d2h_mbps"] = 0.0  # wedged: the handshake never returned
    else:
        mbps_small = 16e-3 / max(dt_small, 1e-6)
        if mbps_small < _D2H_HEALTHY_MBPS:
            # already degraded: report the small-probe estimate rather than
            # launching a 1 MB fetch that would time out AND keep dragging
            # through the link during the measurement that follows
            out["d2h_mbps"] = round(mbps_small, 4)
        else:
            dt = timed_fetch(big, 30.0)
            # a timed-out large fetch means the link collapsed mid-probe:
            # it is alive (the 16 KB returned) but not at mbps_small —
            # report the small-probe estimate, not a fake 0.0
            out["d2h_mbps"] = (round(1.0 / dt, 2) if dt
                               else round(mbps_small, 4))
    return out


def _build(scan_k: int, aot: bool = True, batch_per_replica: int = 16):
    """Compile the benchmark program: the per-step FixMatch train step
    (scan_k=1) or a K-step ``lax.scan`` over it. Returns
    ``(compiled, state, run_batch, flops_per_call, global_batch)``.

    ``aot=False`` skips the AOT compile and returns the jitted-but-
    uncompiled step (flops 0.0) — for callers that only need the built
    state/batch to assemble a different program (tools/profile_step.py
    --augment), where the compile would be pure wasted wall-clock.
    ``batch_per_replica`` stays at the reference recipe's 16 for the
    number of record; tools/bench_scale.py sweeps it."""
    import jax

    from __graft_entry__ import _flagship_config
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.algorithms.fixmatch import SPEC, make_train_step
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import (
        batch_sharding, data_parallel_size, make_mesh, replicated,
    )
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    sig_len = 2500
    config = _flagship_config(signal_length=sig_len,
                              batch_per_replica=batch_per_replica)
    mesh = make_mesh(config)
    dp = data_parallel_size(mesh)
    global_batch = batch_per_replica * dp

    model = build_model_from_config(config, train=True)
    tx = build_optimizer(config, None, steps_per_epoch=1000, model=model)
    state = build_state(config, model, tx, SPEC, seed=0)
    state = jax.device_put(state, replicated(mesh))

    rng = np.random.default_rng(0)
    batch = {
        "ecg": rng.standard_normal(
            (global_batch, 1, sig_len)).astype("float32"),
        "target": rng.integers(0, 4, (global_batch, sig_len)),
        "ecg_u_w": rng.standard_normal(
            (global_batch, 1, sig_len)).astype("float32"),
        "ecg_u_s": rng.standard_normal(
            (global_batch, 1, sig_len)).astype("float32"),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))

    inner = make_train_step(model, tx, config, 1000)
    if os.environ.get("BENCH_FUSED", "1") != "0":
        # flat fused state: the donated update aliases whole per-dtype
        # buffers instead of ~430 tiny leaves (kills the per-leaf aliasing
        # copy pairs — 6.9% of the B=64 step, NOTES.md). Same default as
        # run_training; BENCH_FUSED=0 measures the tree path.
        from semi_seg_ecg_tpu.utils.fused_state import (
            FuseMeta, FusedTrainState, wrap_step as _fuse_wrap,
        )

        _meta = FuseMeta(state)
        _bufs, _pass = _meta._jit_pack(state)
        state = FusedTrainState(buffers=_bufs, passthrough=_pass, meta=_meta)
        inner = _fuse_wrap(inner, _meta)
    if scan_k > 1:
        from semi_seg_ecg_tpu.parallel.mesh import shard_stacked_batch

        stacked = {
            k: np.broadcast_to(np.asarray(v)[None],
                               (scan_k,) + np.asarray(v).shape).copy()
            for k, v in jax.device_get(batch).items()
        }
        stacked = shard_stacked_batch(mesh, stacked)
        train_step = jax.jit(
            lambda s, b: jax.lax.scan(lambda c, x: inner(c, x), s, b),
            donate_argnums=0,
        )
        run_batch = stacked
    else:
        train_step = jax.jit(inner, donate_argnums=0)
        run_batch = batch

    if not aot:
        return train_step, state, run_batch, 0.0, global_batch
    # one AOT compile serves both the timing loop and the FLOPs estimate
    # (jit dispatch would compile the same program a second time).
    # cost_analysis counts a lax.scan BODY once → scale by trip count.
    compiled = train_step.lower(state, run_batch).compile()
    flops_per_call = _flops_per_call(compiled) * scan_k
    return compiled, state, run_batch, flops_per_call, global_batch


def _measure(compiled, state, run_batch, calls: int, trials: int = 3):
    """Median-of-``trials`` slope timing with a VALUE-FETCH completion
    barrier: run N then 2N sequential calls, then fetch the (few-byte)
    loss scalar — a data dependency that cannot return before the work is
    done, unlike ``block_until_ready`` which the remote tunnel has been
    observed to release early (NOTES.md; it inflated round-2's 17.7k
    number to ~2x reality). ``T(2N) − T(N)`` cancels the fetch latency
    and any fixed ramp-up, leaving N calls of steady-state rate.

    A fully wedged D2H path (observed: 16 KB not returning for minutes)
    would hang even a scalar fetch, so the fetch runs under a thread
    timeout; on timeout the barrier degrades to ``block_until_ready`` on
    the fetched leaf for the rest of the run — its early release is a
    *consistent* bias that the slope subtraction cancels, unlike the
    one-shot window it corrupted in round 2. Returns
    (seconds per N calls, final state, barrier_used)."""
    import threading

    barrier = {"mode": "value-fetch"}

    def sync(m):
        leaf = m["loss"]
        if barrier["mode"] == "value-fetch":
            done = threading.Event()

            def work():
                try:
                    np.asarray(leaf)
                finally:
                    done.set()

            threading.Thread(target=work, daemon=True).start()
            if done.wait(timeout=_FETCH_TIMEOUT_S):
                return
            barrier["mode"] = "block_until_ready"  # wedged D2H: degrade
        leaf.block_until_ready()

    def run(n, s):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            s, m = compiled(s, run_batch)
        sync(m)
        return time.perf_counter() - t0, s

    # warmup (also first real execution after AOT compile)
    _, state = run(max(calls // 10, 2), state)

    # Trial validity (this is the number of record — guard it):
    # - a trial whose barrier DEGRADED mid-trial mixes two timing regimes
    #   (e.g. value-fetch hits the 120 s timeout on the N run, then
    #   block_until_ready returns fast on the 2N run → a negative diff);
    #   it is discarded and re-run under the now-stable barrier;
    # - non-positive diffs are never admitted;
    # - the estimator is the MEDIAN of valid diffs, not the min: with slope
    #   timing, link noise during the N run *inflates* throughput while
    #   noise during the 2N run deflates it, so min() would preferentially
    #   select the most inflated trial.
    diffs = []
    attempts = 0
    t_2n = None
    while len(diffs) < trials and attempts < trials + 2:
        attempts += 1
        mode_before = barrier["mode"]
        t_n, state = run(calls, state)
        t_2n, state = run(2 * calls, state)
        if barrier["mode"] != mode_before:
            continue
        d = t_2n - t_n
        if d > 0:
            diffs.append(d)
    if diffs:
        diffs.sort()
        dt = diffs[len(diffs) // 2]
    else:
        # every trial corrupted: fall back to the absolute 2N window —
        # it UNDER-estimates throughput (the fetch latency stays in the
        # numerator) but cannot go negative or inflate
        dt = t_2n / 2
    return dt, state, barrier["mode"]


def main(steps: int = 100) -> None:
    import jax

    link = probe_link()

    kind = jax.devices()[0].device_kind
    n_chips = len(jax.devices())
    peak = _PEAK_BF16_FLOPS.get(kind)

    def throughput(scan_k, batch_per_replica=16):
        # each slope window needs enough *dispatches* that per-call link
        # noise averages out: steps//32 would give the scan mode only 3
        # calls per window, letting a noisy T(N) fetch swing the recorded
        # rate past the device-busy floor (round-3 finding)
        calls = max(steps // scan_k, 10)
        compiled, state, run_batch, flops_call, global_batch = _build(
            scan_k, batch_per_replica=batch_per_replica)
        dt, _, barrier = _measure(compiled, state, run_batch, calls)
        sps = calls * scan_k * global_batch / dt
        achieved = flops_call * calls / dt
        mfu = (round(achieved / peak, 4)
               if peak and flops_call else None)
        # None (not 0.0) when XLA's cost model is unavailable, so consumers
        # can tell "unknown" from a measured value
        flops_step = flops_call / scan_k if flops_call else None
        return sps, mfu, flops_step, barrier

    scan_env = int(os.environ.get("BENCH_SCAN_STEPS", "0"))
    if scan_env == 1:
        modes = [(1, "per-step")]  # documented pin: per-step only
    elif scan_env > 1:
        modes = [(scan_env, f"scan{scan_env}")]
    else:
        # always measure BOTH dispatch modes and report the faster. The
        # remote tunnel charges ~1.3-3 ms per dispatched program (window-
        # dependent) while the step itself is ~0.9 ms device-busy, so the
        # per-step mode is dispatch-floor-bound through a tunnel; the
        # K=32 scan amortises that floor to ~3% (and its body is device-
        # busy-identical to the per-step program — profiled, NOTES.md
        # round-3 findings). One extra AOT compile is cheap insurance on
        # the number of record.
        modes = [(1, "per-step"), (32, "scan32")]

    results = []
    for scan_k, name in modes:
        sps, mfu, flops_step, barrier = throughput(scan_k)
        results.append({"mode": name, "samples_per_sec": round(sps, 2),
                        "mfu": mfu, "flops_per_step": flops_step,
                        "barrier": barrier})
    best = max(results, key=lambda r: r["samples_per_sec"])
    per_chip = best["samples_per_sec"] / n_chips

    # auxiliary: the chip's best operating point is per-replica batch 64
    # (tools/bench_scale.py sweep — MFU 0.67 vs 0.51 at the recipe's 16);
    # record it alongside the recipe number so the peak is visible in the
    # line of record. BENCH_PEAK=0 skips it.
    peak_row = None
    if os.environ.get("BENCH_PEAK", "1") != "0" and scan_env == 0:
        sps, mfu, flops_step, barrier = throughput(32, batch_per_replica=64)
        peak_row = {"batch_per_replica": 64, "mode": "scan32",
                    "samples_per_sec_per_chip": round(sps / n_chips, 2),
                    "mfu": mfu, "barrier": barrier}

    print(json.dumps({
        "metric": "fixmatch_resnet18_train_samples_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 2),
        "mfu": best["mfu"],
        "flops_per_step": best["flops_per_step"],
        "mode": best["mode"],
        "barrier": best["barrier"],
        "device_kind": kind,
        "link": link,
        "all_modes": results if len(results) > 1 else None,
        "peak": peak_row,
        "baseline": BASELINE_PROVENANCE,
    }))


def _main_with_watchdog(steps: int, deadline_s: float) -> None:
    """Run :func:`main` under a global deadline.

    A fully wedged tunnel can hang *device enumeration itself* (observed:
    ``jax.devices()`` not returning for hours, NOTES.md) — none of the
    in-bench probes can fire if the backend never comes up. The watchdog
    guarantees the driver records a self-flagging JSON line instead of an
    absent one. ``os._exit`` is required: the worker thread is stuck in
    an uninterruptible extension call."""
    import threading

    done = threading.Event()
    failure: list = []

    def work():
        try:
            main(steps=steps)
        except BaseException as e:  # noqa: BLE001 - report, don't swallow
            failure.append(e)
        finally:
            done.set()

    threading.Thread(target=work, daemon=True).start()
    if not done.wait(deadline_s):
        print(json.dumps({
            "metric": "fixmatch_resnet18_train_samples_per_sec_per_chip",
            "value": 0.0,
            "unit": "samples/sec/chip",
            "vs_baseline": 0.0,
            "error": f"benchmark did not complete within {deadline_s:.0f}s "
                     "(device backend wedged?)",
            "link": {"healthy": False},
            "baseline": BASELINE_PROVENANCE,
        }), flush=True)
        os._exit(0)
    if failure:
        raise failure[0]


if __name__ == "__main__":
    _main_with_watchdog(
        steps=int(os.environ.get("BENCH_STEPS", "100")),
        deadline_s=float(os.environ.get("BENCH_DEADLINE_S", "1500")),
    )
