"""Semi-supervised efficacy validation on synthetic data.

Trains each requested algorithm on a low-label synthetic split (8 labeled /
96 unlabeled records) and reports test MeanIoU, demonstrating that every
semi-supervised objective improves over supervised-only (results recorded
in BASELINE.md / NOTES.md).

Run: ``python tools/validate_ssl.py [--algorithms base fixmatch ...]``.
``--seeds 0 1 2`` repeats every algorithm across training seeds and reports
mean +/- std (the multi-seed evidence VERDICT r2 asked the quality story to
rest on); ``--cpu N`` forces an N-device CPU mesh so the study is
independent of the remote-TPU tunnel's health.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cfg(algo, exp, root, data, epochs, seed=0):
    from semi_seg_ecg_tpu.config import normalize_config
    from tools.gen_configs import flagship_data_recipe

    d = {
        "seed": seed, "output_dir": os.path.join(root, "exps"), "exp_name": exp,
        "resume": None, "start_epoch": 0, "device": None, "use_amp": True,
        "algorithm": algo, "mode": "scratch", "pretrained_backbone": None,
        "backbone": {"resnet18": {"num_leads": 1, "num_stages": 4,
            "out_indices": [0, 1, 2, 3], "dilations": [1, 1, 1, 1],
            "strides": [1, 2, 2, 2], "deep_stem": False, "avg_down": False,
            "contract_dilation": False}},
        "decode_head": {"FCNHead": {"in_channels": 512, "in_index": 3,
            "channels": 128, "num_convs": 1, "concat_input": False,
            "dropout_ratio": 0.1, "num_classes": 4, "align_corners": False}},
        "dataset": {**data, **flagship_data_recipe(2500)},
        "dataloader": {"batch_size": 4, "num_workers": 8,
                       "pin_memory": False},
        "train": {"epochs": epochs, "accum_iter": 1, "warmup_epochs": 3,
            "min_lr": 1e-4, "blr": None, "lr": 1e-3, "weight_decay": 0.05,
            "max_norm": None, "layer_decay": None, "optimizer": "adamw",
            "optimizer_kwargs": {"betas": [0.9, 0.999]},
            "conf_thresh": 0.80, "ema_decay": 0.99},
        "metric": {"task": "segmentation", "num_classes": 4,
            "include_background": True, "per_class": False,
            "input_format": "one-hot", "target_metrics": ["MeanIoU"]},
        "test": {"target_metric": "MeanIoU"},
    }
    if algo == "reco":
        d["use_latent_projection"] = True
        d["projection_in_dim"] = 512
        d["projection_out_dim"] = 128
        d["train"].update(eash_conf_thresh=0.65, hard_conf_thresh=0.80,
                          contr_temp=0.25, contr_num_queries=64,
                          contr_num_negatives=128)
    return normalize_config(d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithms", nargs="+",
                    default=["base", "fixmatch", "mean_teacher", "cps",
                             "reco", "stpp"])
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0],
                    help="training seeds; >1 reports mean +/- std")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force an N-device CPU mesh (tunnel-independent)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_num_cpu_devices", args.cpu)
        jax.config.update("jax_platforms", "cpu")

    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset

    root = tempfile.mkdtemp(prefix="ssl_validate_")
    data = make_synthetic_dataset(
        root, num_train_labeled=8, num_train_unlabeled=96,
        num_valid=16, num_test=32, length=2500, seed=11,
    )
    per_seed = {}
    for algo in args.algorithms:
        per_seed[algo] = []
        for seed in args.seeds:
            c = cfg(algo, f"ssl_{algo}_s{seed}", root, data, args.epochs,
                    seed=seed)
            get_algorithm(algo).train(c)
            m = get_algorithm(algo).test(c)
            per_seed[algo].append(m["MeanIoU"])
            print("RESULT", algo, "seed", seed, m, flush=True)
    import numpy as np
    results = {
        algo: {"mean": round(float(np.mean(v)), 4),
               "std": round(float(np.std(v)), 4),
               "seeds": v}
        for algo, v in per_seed.items()
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
