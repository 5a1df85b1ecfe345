#!/usr/bin/env bash
# Training launcher (reference scripts/train.sh surface parity).
#
# Usage:
#   bash scripts/train.sh -f configs/base/resnet18/fixmatch.yaml \
#        -o configs/bench/ludb/1over16.yaml [--exp_name NAME] \
#        [--output_dir DIR] [--resume CKPT] [--start_epoch N]
#
# Notes vs the reference:
#  * no torchrun / --nproc_per_node: one JAX process drives every local TPU
#    chip through the device mesh; multi-host jobs set COORDINATOR_ADDRESS /
#    NUM_PROCESSES / PROCESS_ID (or run under SLURM) and launch this same
#    script once per host.
#  * --gpus / --master_port are accepted and ignored for drop-in
#    compatibility with existing invocations.
set -euo pipefail

ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --gpus|--master_port) shift 2 ;;          # legacy flags: ignored
    *) ARGS+=("$1"); shift ;;
  esac
done

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "${SCRIPT_DIR}/.."
exec python train.py "${ARGS[@]}"
