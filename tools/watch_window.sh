#!/bin/bash
# Low-frequency link-window watcher: every INTERVAL seconds, pay the D2H
# first-fetch handshake in a fresh process (bounded) and log how long it
# took plus the steady-state bandwidth that follows. Appends JSONL to
# bench_logs/window_watch.jsonl. Deliberately sparse — hammering the
# wedged tunnel is suspected of prolonging the wedge (NOTES.md).
INTERVAL=${1:-720}
BUDGET=${2:-300}
LOG=bench_logs/window_watch.jsonl
while true; do
  timeout $((BUDGET + 60)) python - <<EOF >> "$LOG" 2>/dev/null
import json, time, threading
import numpy as np
import jax, jax.numpy as jnp
rec = {"utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
w = jnp.zeros((4,), jnp.float32); w.block_until_ready()
box = {}
def work():
    t0 = time.perf_counter(); np.asarray(w); box["dt"] = time.perf_counter() - t0
th = threading.Thread(target=work, daemon=True); th.start(); th.join($BUDGET)
rec["handshake_s"] = round(box["dt"], 1) if "dt" in box else None
if "dt" in box:
    a = jnp.full((256 * 1024,), 7.0); a.block_until_ready()
    t0 = time.perf_counter(); np.asarray(a)
    rec["d2h_mbps"] = round(1.0 / (time.perf_counter() - t0), 1)
print(json.dumps(rec), flush=True)
EOF
  if [ $? -ne 0 ]; then
    # the probe process itself was killed (backend init / dispatch hang):
    # log that too, or a silent gap is indistinguishable from not running
    echo "{\"utc\": \"$(date -u +%Y-%m-%dT%H:%M:%SZ)\", \"probe\": \"killed\"}" >> "$LOG"
  fi
  sleep "$INTERVAL"
done
