#!/usr/bin/env bash
# [sic] — the reference names this file `inferernce.sh`; kept for drop-in
# compatibility. Delegates to inference.sh.
exec bash "$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)/inference.sh" "$@"
