"""Unit tests for bench.py's slope-timing measurement core.

The bench is the driver's number of record; these tests pin the two
behaviors that keep it alive through a degraded remote-TPU link
(NOTES.md "Environment pitfalls"):

- the completion barrier is a value fetch of the loss scalar, and
- a wedged D2H path (fetch never returns) degrades the barrier to
  ``block_until_ready`` under a timeout instead of hanging the bench.
"""

import os
import threading
import time

import numpy as np
import pytest

import bench


class _Leaf:
    """Stand-in for a device array: ``np.asarray`` may hang (wedged D2H),
    ``block_until_ready`` always returns."""

    def __init__(self, value, hang_event=None):
        self.value = value
        self.hang_event = hang_event
        self.blocked = 0

    def __array__(self, dtype=None, copy=None):
        if self.hang_event is not None:
            self.hang_event.wait()  # simulate a fetch that never returns
        arr = np.asarray([self.value], dtype=dtype or np.float32)
        return arr.copy() if copy else arr

    def block_until_ready(self):
        self.blocked += 1
        return self


def _fake_compiled(step_s=0.0, hang_event=None):
    def compiled(state, batch):
        if step_s:
            time.sleep(step_s)
        return state + 1, {"loss": _Leaf(float(state), hang_event)}

    return compiled


def test_measure_value_fetch_barrier():
    dt, state, barrier = bench._measure(
        _fake_compiled(step_s=0.001), 0, None, calls=5, trials=1)
    assert barrier == "value-fetch"
    assert state == 5 * (1 + 2) + 2  # warmup max(5//10,2) + N + 2N calls
    assert 0.003 < dt < 1.0  # ~5 x 1 ms, slope-cancelled


def test_measure_degrades_to_block_on_wedged_fetch(monkeypatch):
    monkeypatch.setattr(bench, "_FETCH_TIMEOUT_S", 0.05)
    release = threading.Event()
    try:
        dt, _, barrier = bench._measure(
            _fake_compiled(step_s=0.0, hang_event=release), 0, None,
            calls=3, trials=1)
    finally:
        release.set()  # drain the daemon fetch thread
    assert barrier == "block_until_ready"
    assert dt < 1.0  # did not hang on the wedged fetch


@pytest.mark.parametrize("trials", [1, 2])
def test_measure_slope_is_positive(trials):
    dt, _, _ = bench._measure(
        _fake_compiled(step_s=0.002), 0, None, calls=3, trials=trials)
    assert dt > 0


class _LateWedgeLeaf(_Leaf):
    """Fetches succeed until the shared counter reaches ``wedge_at``, then
    hang — models a D2H path that collapses mid-measurement."""

    def __init__(self, value, counter, wedge_at, hang_event):
        super().__init__(value)
        self.counter = counter
        self.wedge_at = wedge_at
        self.late_hang = hang_event

    def __array__(self, dtype=None, copy=None):
        self.counter["n"] += 1
        if self.counter["n"] >= self.wedge_at:
            self.late_hang.wait()
        return super().__array__(dtype, copy)


def test_mid_trial_degrade_cannot_go_negative(monkeypatch):
    """A barrier that degrades BETWEEN the N and 2N runs of a trial mixes a
    120 s-timeout t_n with a fast t_2n — a hugely negative diff. That trial
    must be discarded (re-run under the stable barrier), never admitted as
    the headline dt (which would print a negative samples/sec of record)."""
    monkeypatch.setattr(bench, "_FETCH_TIMEOUT_S", 0.2)
    counter = {"n": 0}
    release = threading.Event()

    def compiled(state, batch):
        time.sleep(0.001)
        # sync #1 = warmup, #2 = trial-1 t_n (wedges: +0.2 s timeout,
        # degrades the barrier), later syncs use block_until_ready
        return state + 1, {
            "loss": _LateWedgeLeaf(float(state), counter, 2, release)}

    try:
        dt, _, barrier = bench._measure(compiled, 0, None, calls=5,
                                        trials=1)
    finally:
        release.set()
    assert barrier == "block_until_ready"
    assert dt > 0
    # the corrupted trial's diff would have been ~ -(0.2 - 5ms) < 0; the
    # re-run clean trial is ~5 x 1 ms
    assert dt < 0.15


class _ScriptedFetch:
    """Fake ``timed_fetch(arr, timeout_s)``: returns the scripted duration
    for the sentinel, or None when the script says the fetch out-waits its
    timeout. Records which sentinels were actually fetched."""

    def __init__(self, durations):
        self.durations = durations  # sentinel -> seconds or None
        self.fetched = []

    def __call__(self, arr, timeout_s):
        self.fetched.append(arr)
        dt = self.durations[arr]
        if dt is None or dt > timeout_s:
            return None
        return dt


def test_d2h_probe_pays_the_handshake_then_measures_steady_state(monkeypatch):
    """The five-session misclassification (NOTES.md "first-fetch
    handshake"): a 40 s first fetch followed by a healthy link must be
    reported healthy, not 0.0."""
    # isolate from the shell: run_clean_sweep.sh exports a budget into any
    # shell that sources it; a value < 40 would "time out" the scripted fetch
    monkeypatch.delenv("ECG_D2H_HANDSHAKE_TIMEOUT_S", raising=False)
    fetch = _ScriptedFetch({"warm": 40.0, "small": 0.001, "big": 0.05})
    out = bench._staged_d2h_probe(fetch, "warm", "small", "big")
    assert out["d2h_first_fetch_s"] == 40.0
    assert out["d2h_mbps"] == 20.0  # 1 MB / 0.05 s
    assert out["d2h_mbps"] > bench._D2H_HEALTHY_MBPS


def test_d2h_probe_reports_dead_only_when_handshake_never_returns(monkeypatch):
    monkeypatch.delenv("ECG_D2H_HANDSHAKE_TIMEOUT_S", raising=False)
    fetch = _ScriptedFetch({"warm": None, "small": 0.001, "big": 0.05})
    out = bench._staged_d2h_probe(fetch, "warm", "small", "big")
    assert out["d2h_first_fetch_s"] is None
    assert out["d2h_mbps"] == 0.0
    assert fetch.fetched == ["warm"]  # no further fetches drag the link


def test_d2h_probe_degraded_small_skips_the_large_fetch(monkeypatch):
    # 16 KB in 2 s = 0.008 MB/s: collapsed-but-alive; the 1 MB fetch
    # would take ~2 minutes and must not be launched
    monkeypatch.delenv("ECG_D2H_HANDSHAKE_TIMEOUT_S", raising=False)
    fetch = _ScriptedFetch({"warm": 0.5, "small": 2.0, "big": 60.0})
    out = bench._staged_d2h_probe(fetch, "warm", "small", "big")
    assert out["d2h_mbps"] == pytest.approx(0.008)
    assert "big" not in fetch.fetched


def test_d2h_probe_mid_probe_collapse_falls_back_to_small_estimate(monkeypatch):
    monkeypatch.delenv("ECG_D2H_HANDSHAKE_TIMEOUT_S", raising=False)
    fetch = _ScriptedFetch({"warm": 0.5, "small": 0.001, "big": None})
    out = bench._staged_d2h_probe(fetch, "warm", "small", "big")
    assert out["d2h_mbps"] == pytest.approx(16.0)  # 16 KB / 1 ms
    assert out["d2h_mbps"] != 0.0


def test_watchdog_emits_flagged_json_when_bench_hangs():
    """A fully wedged tunnel hangs jax.devices() itself; the driver must
    still receive one self-flagging JSON line (subprocess: the watchdog
    path ends in os._exit)."""
    import json
    import subprocess
    import sys

    code = (
        "import time, bench\n"
        "bench.main = lambda steps: time.sleep(60)\n"
        "bench._main_with_watchdog(1, 0.5)\n"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=60, cwd=repo_root)
    assert out.returncode == 0
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["value"] == 0.0
    assert "error" in line
    assert line["link"]["healthy"] is False
