"""Training entry point.

CLI parity with the reference (src/train.py): ``-f/--config_path``,
``-o/--override_config_path``, ``--output_dir``, ``--exp_name``,
``--resume``, ``--start_epoch``; dispatches ``config['algorithm']`` through
the registry and optionally runs the test pass afterwards
(``config['test']`` truthy, src/train.py:87-90).
"""

import sys

from semi_seg_ecg_tpu.algorithms import get_algorithm
from semi_seg_ecg_tpu.config import parse_train_args


def main(argv=None):
    config = parse_train_args(argv)
    algo = get_algorithm(config.get("algorithm"))
    algo.train(config)
    if config.get("test", False):
        # unlike the reference (which collapses to one process,
        # src/train.py:87-90), the test pass is a sharded collective — every
        # process participates; file writes stay rank-0-only inside run_test
        algo.test(config)


if __name__ == "__main__":
    main(sys.argv[1:])
