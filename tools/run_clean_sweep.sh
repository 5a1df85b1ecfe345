#!/bin/bash
# The clean-window measurement sweep (VERDICT r3 #3), serialized with
# per-tool timeouts, every output archived to bench_logs/sweep_<ts>/.
# Run only when tools/watch_window.sh shows the D2H handshake completing
# (bench_logs/window_watch.jsonl) — each tool is a fresh process and pays
# its own handshake (budget via ECG_D2H_HANDSHAKE_TIMEOUT_S below).
# Serialize: never run two of these concurrently (remote-compile wedges,
# NOTES.md). Usage: bash tools/run_clean_sweep.sh [quick]
set -u
export ECG_D2H_HANDSHAKE_TIMEOUT_S=${ECG_D2H_HANDSHAKE_TIMEOUT_S:-240}
TS=$(date -u +%Y%m%dT%H%M%SZ)
OUT=bench_logs/sweep_$TS
mkdir -p "$OUT"
# Pause the sparse watcher for the duration: a watcher probe (fresh-process
# handshake + 1 MB fetch) firing mid-bench perturbs the tunnel during the
# measurements of record. watch_window.sh skips probes while this flag
# exists; removed on any exit.
PAUSE_FLAG=bench_logs/sweep_running
touch "$PAUSE_FLAG"
trap 'rm -f "$PAUSE_FLAG"' EXIT
# doctor must out-wait the probe's worst case: handshake(<=budget) + small
# + big fetches + H2D/dispatch; its default --deadline 240 would falsely
# report "wedged" in exactly the slow-handshake windows this sweep targets.
DOCTOR_DEADLINE=$((ECG_D2H_HANDSHAKE_TIMEOUT_S + 120))
DOCTOR_TIMEOUT=$((DOCTOR_DEADLINE + 240))
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/sweep.log"
  timeout "$t" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- $name rc=$rc ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/sweep.log"
  tail -3 "$OUT/$name.out" | tee -a "$OUT/sweep.log"
}
run doctor       "$DOCTOR_TIMEOUT" python tools/doctor.py --deadline "$DOCTOR_DEADLINE"
run bench        1800 python bench.py
run e2e          3600 python tools/bench_e2e.py
run infer_float  900 python tools/bench_inference.py
run infer_int8s  1200 python tools/bench_inference.py --int8 --static
if [ "${1:-}" != "quick" ]; then
  # the int8 + 50%-overlap stitch numbers are the session-6 pending
  # re-measures (their recorded values are lower bounds, NOTES.md)
  # the geometry of the published rows (docs/PERFORMANCE.md): 24 h
  # records at batch 256
  run holter       1800 python tools/bench_holter.py --hours 24 --batch 256
  run holter_int8  1800 python tools/bench_holter.py --hours 24 --batch 256 --int8
  run holter_ovlp  1800 python tools/bench_holter.py --hours 24 --batch 256 --hop 1250
  run gather       900 python tools/bench_gather.py
  run scale        1800 python tools/bench_scale.py
fi
run doctor_after "$DOCTOR_TIMEOUT" python tools/doctor.py --deadline "$DOCTOR_DEADLINE"
echo "sweep complete: $OUT" | tee -a "$OUT/sweep.log"
