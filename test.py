"""Evaluation entry point (reference src/test.py parity): loads
``best-{target_metric}`` (or ``--model_path``) and writes
``test_metrics.csv`` / ``test_outputs.npy`` / ``test_labels.npy``."""

import sys

from semi_seg_ecg_tpu.algorithms import get_algorithm
from semi_seg_ecg_tpu.config import parse_eval_args


def main(argv=None):
    config = parse_eval_args(argv, prog="ECG segmentation test")
    algo = get_algorithm(config.get("algorithm"))
    algo.test(config)


if __name__ == "__main__":
    main(sys.argv[1:])
