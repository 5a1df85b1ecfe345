#!/usr/bin/env bash
# Evaluation launcher (reference scripts/test.sh surface parity).
# Usage: bash scripts/test.sh -f CONFIG [-o OVERRIDE] [--model_path CKPT] ...
set -euo pipefail

ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --gpus|--master_port) shift 2 ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "${SCRIPT_DIR}/.."
exec python test.py "${ARGS[@]}"
