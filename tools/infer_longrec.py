#!/usr/bin/env python
"""Segment one long record (Holter/telemetry scale) with a trained model.

Thin shim over ``semi_seg_ecg_tpu.cli.infer_longrec_main`` (also
installed as the ``ecg-infer-longrec`` console script) — see that
function and docs/USAGE.md "Long-record (Holter) inference".

Usage:
  python tools/infer_longrec.py -f configs/... [-o override.yaml]
      --record rec.npy [--model_path ckpt] [--hop N] [--batch B]
      [--taper hann|flat] [--out-dir DIR] [--intervals --fs 250]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semi_seg_ecg_tpu.cli import infer_longrec_main as main  # noqa: E402
from semi_seg_ecg_tpu.cli import load_record  # noqa: E402,F401 (re-export)

if __name__ == "__main__":
    main()
