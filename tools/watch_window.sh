#!/bin/bash
# Low-frequency link-window watcher: every INTERVAL seconds, pay the D2H
# first-fetch handshake in a fresh process (bounded) and log how long it
# took plus the steady-state bandwidth that follows. Appends JSONL to
# bench_logs/window_watch.jsonl. Deliberately sparse — hammering the
# wedged tunnel is suspected of prolonging the wedge (NOTES.md).
# Probes are skipped while bench_logs/sweep_running exists (the clean
# sweep pauses the watcher so its traffic can't perturb the measurements
# of record).
INTERVAL=${1:-720}
BUDGET=${2:-300}
LOG=bench_logs/window_watch.jsonl
while true; do
  if [ -e bench_logs/sweep_running ]; then
    echo "{\"utc\": \"$(date -u +%Y-%m-%dT%H:%M:%SZ)\", \"probe\": \"paused_for_sweep\"}" >> "$LOG"
    sleep "$INTERVAL"
    continue
  fi
  timeout $((BUDGET + 120)) python - <<EOF >> "$LOG" 2>/dev/null
import json, os, time, threading
import numpy as np
import jax, jax.numpy as jnp
def now():
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
def timed_fetch(arr, budget):
    box = {}
    def work():
        t0 = time.perf_counter(); np.asarray(arr)
        box["dt"] = time.perf_counter() - t0
    th = threading.Thread(target=work, daemon=True); th.start(); th.join(budget)
    return box.get("dt")
w = jnp.zeros((4,), jnp.float32); w.block_until_ready()
dt = timed_fetch(w, $BUDGET)
# emit the handshake record IMMEDIATELY: if the steady-state fetch below
# out-waits the outer timeout, this completed-handshake signal (the very
# thing the watcher exists to catch) must already be on disk
print(json.dumps({"utc": now(),
                  "handshake_s": round(dt, 1) if dt is not None else None}),
      flush=True)
if dt is not None:
    a = jnp.full((256 * 1024,), 7.0); a.block_until_ready()
    dt2 = timed_fetch(a, 90)  # 1 MB under its own bound: a collapsed-but-
    # alive link (KB/s) must yield a record, not an outer-timeout kill
    print(json.dumps({"utc": now(),
                      "d2h_mbps": round(1.0 / dt2, 2) if dt2 else 0.0,
                      "steady_timed_out": dt2 is None}), flush=True)
# daemon fetch threads stuck in the PJRT C++ client make interpreter
# teardown hang/abort (doctor.py's os._exit rationale) — skip teardown so
# a timed-out handshake doesn't append a spurious "probe: killed" line
os._exit(0)
EOF
  if [ $? -ne 0 ]; then
    # the probe process itself was killed (backend init / dispatch hang):
    # log that too, or a silent gap is indistinguishable from not running
    echo "{\"utc\": \"$(date -u +%Y-%m-%dT%H:%M:%SZ)\", \"probe\": \"killed\"}" >> "$LOG"
  fi
  sleep "$INTERVAL"
done
