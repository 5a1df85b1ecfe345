"""Benchmark-grid sweep driver.

Runs the (dataset × label-ratio × algorithm × backbone) grid the reference
leaves to manual shell invocations (BASELINE.json: "In-domain benchmark
sweep ... across label ratios, all src/algorithms methods") and aggregates
every run's ``test_metrics.csv`` into one results table.

Usage:
  python tools/run_bench_grid.py --output_dir exps/sweep \\
      --backbones resnet18 --algorithms scratch fixmatch \\
      --datasets ludb qtdb --ratios 2 16 [--epochs 100]
  python tools/run_bench_grid.py --synthetic --epochs 3   # self-contained demo

Each cell = `train.py -f configs/base/{backbone}/{algo}.yaml -o
configs/bench/{dataset}/1over{ratio}.yaml` semantics, in-process.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from semi_seg_ecg_tpu.algorithms import get_algorithm  # noqa: E402
from semi_seg_ecg_tpu.config import (  # noqa: E402
    deep_merge,
    load_config,
    normalize_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cell(backbone, algo, dataset, ratio, args, synthetic_data=None):
    base = os.path.join(REPO, "configs", "base", backbone, f"{algo}.yaml")
    over = os.path.join(REPO, "configs", "bench", dataset,
                        f"1over{ratio}.yaml")
    config = load_config(base, over)
    override = {"output_dir": args.output_dir}
    if synthetic_data is not None:
        override["dataset"] = dict(synthetic_data)
    if args.epochs:
        override["train"] = {"epochs": args.epochs,
                             "warmup_epochs": min(
                                 config["train"]["warmup_epochs"],
                                 max(args.epochs // 10, 1))}
    if args.batch_size:
        override["dataloader"] = {"batch_size": args.batch_size}
    config = normalize_config(deep_merge(config, override))
    config["exp_name"] = f"{backbone}/{algo}/{dataset}/1over{ratio}"
    module = get_algorithm(config["algorithm"])
    module.train(config)
    metrics = module.test(config)
    return {"backbone": backbone, "algorithm": algo, "dataset": dataset,
            "ratio": f"1/{ratio}", **metrics}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--backbones", nargs="+", default=["resnet18"])
    ap.add_argument("--algorithms", nargs="+",
                    default=["scratch", "mean_teacher", "fixmatch", "cps",
                             "reco", "stpp"])
    ap.add_argument("--datasets", nargs="+",
                    default=["ludb", "qtdb", "isp", "zhejiang"])
    ap.add_argument("--ratios", nargs="+", type=int, default=[2, 4, 8, 16])
    ap.add_argument("--epochs", type=int, default=None,
                    help="override recipe epochs (e.g. smoke runs)")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="substitute a synthetic dataset for every cell "
                         "(self-contained demo / CI)")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force an N-device CPU mesh (link-independent "
                         "smoke sweeps; same knob as validate_ssl)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_num_cpu_devices", args.cpu)
        jax.config.update("jax_platforms", "cpu")

    synthetic_data = None
    if args.synthetic:
        from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset

        root = tempfile.mkdtemp(prefix="bench_grid_")
        synthetic_data = make_synthetic_dataset(
            root, num_train_labeled=16, num_train_unlabeled=32,
            num_valid=8, num_test=8,
        )
        if args.output_dir is None:
            args.output_dir = os.path.join(root, "exps")
    assert args.output_dir, "--output_dir required for real-data sweeps"

    rows = []
    for backbone in args.backbones:
        for dataset in args.datasets:
            for ratio in args.ratios:
                for algo in args.algorithms:
                    print(f"=== {backbone} / {algo} / {dataset} 1/{ratio} ===")
                    rows.append(run_cell(backbone, algo, dataset, ratio,
                                         args, synthetic_data))
                    df = pd.DataFrame(rows)
                    out_csv = os.path.join(args.output_dir, "sweep_results.csv")
                    os.makedirs(args.output_dir, exist_ok=True)
                    df.to_csv(out_csv, index=False, float_format="%.4f")
    print(df.to_string(index=False))
    print(f"results: {out_csv}")


if __name__ == "__main__":
    main()
