"""Inference entry point (reference src/inference.py parity): softmax
outputs over the test split → ``test_outputs.npy``, no labels required."""

import sys

from semi_seg_ecg_tpu.algorithms.common import run_inference
from semi_seg_ecg_tpu.config import parse_eval_args


def main(argv=None):
    config = parse_eval_args(argv, prog="ECG segmentation inference")
    run_inference(config)


if __name__ == "__main__":
    main(sys.argv[1:])
