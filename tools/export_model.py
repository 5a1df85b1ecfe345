"""Export a trained checkpoint to a self-contained serving artifact.

``python tools/export_model.py -f config.yaml [-o override.yaml]
[--model_path CKPT] [--out model.shlo] [--batch N] [--platforms tpu cpu]``

Produces a serialized StableHLO program (weights baked in) that loads
with ``semi_seg_ecg_tpu.serving.load_serving`` — or any ``jax.export``
consumer — without the framework's model code or checkpoints. See
``semi_seg_ecg_tpu/serving.py`` for the artifact contract.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semi_seg_ecg_tpu.config import (  # noqa: E402
    load_config, normalize_config, test_cfg,
)


def main(argv=None):
    ap = argparse.ArgumentParser("ECG segmentation model export")
    ap.add_argument("-f", "--config_path", required=True, metavar="FILE")
    ap.add_argument("-o", "--override_config_path", default=None,
                    metavar="FILE")
    ap.add_argument("--model_path", default="", metavar="PATH",
                    help="checkpoint to export (default: the config's "
                         "best-{target_metric}.ckpt)")
    ap.add_argument("--out", default="", metavar="PATH",
                    help="artifact path (default: "
                         "{exp_dir}/serving-{exp_name}.shlo)")
    ap.add_argument("--batch", type=int, default=None,
                    help="pin the batch dimension (default: symbolic — "
                         "one artifact serves any batch size)")
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lowering platforms, e.g. --platforms tpu cpu "
                         "(default: current backend)")
    args = ap.parse_args(argv)

    config = load_config(args.config_path, args.override_config_path)
    if args.model_path:
        config["test"] = test_cfg(config)
        config["test"]["model_path"] = args.model_path
    config = normalize_config(config)

    from semi_seg_ecg_tpu.algorithms.common import experiment_dir
    from semi_seg_ecg_tpu.serving import export_serving

    out = args.out
    if not out:
        exp_dir = experiment_dir(config)
        if not exp_dir:
            ap.error("config has no output_dir/exp_name to derive an "
                     "artifact path from - pass --out PATH")
        out = os.path.join(
            exp_dir, f"serving-{config.get('exp_name', 'model')}.shlo")
    header = export_serving(config, out, batch_size=args.batch,
                            platforms=args.platforms)
    print(json.dumps({"artifact": out,
                      "bytes": os.path.getsize(out), **header}))


if __name__ == "__main__":
    main(sys.argv[1:])
