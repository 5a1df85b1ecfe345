"""Evaluation entry point (reference src/test.py parity): loads
``best-{target_metric}`` (or ``--model_path``) and writes
``test_metrics.csv`` / ``test_outputs.npy`` / ``test_labels.npy``."""

import sys

from semi_seg_ecg_tpu.cli import test_main as main

if __name__ == "__main__":
    main(sys.argv[1:])
