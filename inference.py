"""Inference entry point (reference src/inference.py parity): softmax
outputs over the test split → ``test_outputs.npy``, no labels required."""

import sys

from semi_seg_ecg_tpu.cli import inference_main as main

if __name__ == "__main__":
    main(sys.argv[1:])
