"""Training entry point.

CLI parity with the reference (src/train.py): ``-f/--config_path``,
``-o/--override_config_path``, ``--output_dir``, ``--exp_name``,
``--resume``, ``--start_epoch``; dispatches ``config['algorithm']`` through
the registry and optionally runs the test pass afterwards
(``config['test']`` truthy, src/train.py:87-90).
"""

import sys

from semi_seg_ecg_tpu.cli import train_main as main

# note vs the reference: its post-train test collapses to one process
# (src/train.py:87-90); ours is a sharded collective — every process
# participates, file writes stay rank-0-only (see semi_seg_ecg_tpu/cli.py)

if __name__ == "__main__":
    main(sys.argv[1:])
