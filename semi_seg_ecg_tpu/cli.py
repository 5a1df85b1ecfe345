"""Console entry points (``ecg-train`` / ``ecg-test`` / ``ecg-inference``).

Same behavior as the repo-root ``train.py`` / ``test.py`` /
``inference.py`` scripts (reference parity: src/train.py, src/test.py,
src/inference.py); packaged here so an installed wheel exposes the CLIs
without a repo checkout.
"""

import sys


def train_main(argv=None):
    from .algorithms import get_algorithm
    from .config import parse_train_args

    config = parse_train_args(argv if argv is not None else sys.argv[1:])
    algo = get_algorithm(config.get("algorithm"))
    algo.train(config)
    if config.get("test", False):
        # the test pass is a sharded collective — every process
        # participates; file writes stay rank-0-only inside run_test
        algo.test(config)


def test_main(argv=None):
    from .algorithms import get_algorithm
    from .config import parse_eval_args

    config = parse_eval_args(argv if argv is not None else sys.argv[1:],
                             prog="ECG segmentation test")
    algo = get_algorithm(config.get("algorithm"))
    algo.test(config)


def inference_main(argv=None):
    from .algorithms.common import run_inference
    from .config import parse_eval_args

    config = parse_eval_args(argv if argv is not None else sys.argv[1:],
                             prog="ECG segmentation inference")
    run_inference(config)
