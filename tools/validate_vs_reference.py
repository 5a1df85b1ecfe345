"""Converged-quality head-to-head: the ACTUAL reference implementation vs
this framework, trained end to end on the SAME synthetic data.

The lockstep suite pins 1-2 training steps against the reference's code;
this tool retires the remaining credibility gap (VERDICT r4 "Missing #1"):
nobody had ever trained `/root/reference/src` to convergence and compared
test MeanIoU against this framework on identical inputs. Here both sides
run their FULL pipelines — the reference's `train()`/`test()` verbatim
(reference base.py:248-499, fixmatch.py:28-192, mean_teacher.py) under
torch-CPU with the documented shims (tests/reference_compat.py), and our
`get_algorithm(...).train/test` on a CPU mesh — over the shared synthetic
dataset (same files on disk, same on-disk contract both data pipelines
read), same recipe constants, multiple seeds.

Both sides are scored by ONE metric definition (torchmetrics-1.5.2-parity
MeanIoU; the reference gets it via reference_compat's functional
torchmetrics stub, ours via ops/metrics.py — same formulas).

Run:  python tools/validate_vs_reference.py [--algorithms base fixmatch
      mean_teacher] [--seeds 0 1 2] [--epochs 25] [--cpu 2]
Outputs one JSON line per finished run to --log (survives interruption)
and a final summary table to stdout + --out.
"""

import argparse
import contextlib
import copy
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def reference_config(algo, exp, root, data, epochs, seed=0):
    """The reference-schema config for the shared recipe — same constants
    as tools/validate_ssl.cfg (which builds ours), reference-required keys
    added (device/ddp/resume routing per reference base.py:248-316)."""
    from tools.gen_configs import flagship_data_recipe

    d = {
        "seed": seed, "output_dir": os.path.join(root, "exps"),
        "exp_name": exp, "resume": None, "start_epoch": 0, "device": "cpu",
        # CPU run: torch.cuda.amp.autocast is a no-op without CUDA tensors;
        # False avoids the deprecation warning spam
        "use_amp": False,
        "algorithm": algo, "mode": "scratch", "pretrained_backbone": None,
        "backbone": {"resnet18": {"num_leads": 1, "num_stages": 4,
            "out_indices": [0, 1, 2, 3], "dilations": [1, 1, 1, 1],
            "strides": [1, 2, 2, 2], "deep_stem": False, "avg_down": False,
            "contract_dilation": False}},
        "decode_head": {"FCNHead": {"in_channels": 512, "in_index": 3,
            "channels": 128, "num_convs": 1, "concat_input": False,
            "dropout_ratio": 0.1, "num_classes": 4, "align_corners": False}},
        "dataset": {**data, **flagship_data_recipe(2500)},
        "dataloader": {"batch_size": 4, "num_workers": 0,
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
        "ddp": {"dist_url": "env://", "sync_bn": False},
    }
    if algo == "reco":
        # same constants as tools/validate_ssl.cfg, incl. the reference's
        # typo key `eash_conf_thresh` read verbatim at reco.py:257
        d["use_latent_projection"] = True
        d["projection_in_dim"] = 512
        d["projection_out_dim"] = 128
        d["train"].update(eash_conf_thresh=0.65, hard_conf_thresh=0.80,
                          contr_temp=0.25, contr_num_queries=64,
                          contr_num_negatives=128)
    return d


def run_reference(algo, exp, root, data, epochs, seed, log_dir):
    """Train + test the reference implementation; returns test MeanIoU."""
    from reference_compat import (import_reference_module,
                                  install_functional_metrics_stub)

    install_functional_metrics_stub()
    mod = import_reference_module(f"algorithms.{algo}")
    config = reference_config(algo, exp, root, data, epochs, seed=seed)
    run_log = os.path.join(log_dir, f"{exp}.log")
    t0 = time.time()
    with open(run_log, "w") as f, contextlib.redirect_stdout(f):
        try:
            mod.train(copy.deepcopy(config))
            mod.test(copy.deepcopy(config))
        except SystemExit as e:  # the reference's NaN abort (base.py:135-137)
            print(f"reference run exited: {e}", file=sys.stderr)
            return None, time.time() - t0
        finally:
            # the reference monkey-patches builtins.print with a
            # closed-over stdout-at-patch-time writer; restore so later
            # runs don't write into this run's (closed) log file
            import builtins

            builtins.print = _BUILTIN_PRINT
    import pandas as pd

    csv = os.path.join(config["output_dir"], exp, "test_metrics.csv")
    return float(pd.read_csv(csv)["MeanIoU"].iloc[0]), time.time() - t0


_BUILTIN_PRINT = print


def run_ours(algo, exp, root, data, epochs, seed, batch_per_replica=None):
    """Train + test this framework with the identical recipe.

    ``batch_per_replica`` matches the GLOBAL batch to the reference's
    single-process run: our ``batch_size`` is per-replica (loader
    docstring), so on an N-device mesh the default recipe batch 4 means
    global 4N — N× more samples per step and N× fewer optimizer steps
    per epoch than the torch run. For an apples-to-apples convergence
    race pass ``4 // n_devices`` (SyncBN makes the BN statistics global,
    so global-batch-4 over 2 devices is statistically the reference's
    batch-4)."""
    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from tools.validate_ssl import cfg

    c = cfg(algo, exp, root, data, epochs, seed=seed)
    if batch_per_replica:
        c["dataloader"]["batch_size"] = batch_per_replica
    t0 = time.time()
    get_algorithm(algo).train(c)
    m = get_algorithm(algo).test(c)
    return float(m["MeanIoU"]), time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithms", nargs="+",
                    default=["base", "fixmatch", "mean_teacher"])
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--cpu", type=int, default=2, metavar="N",
                    help="N-device CPU mesh for our side (0 = default jax)")
    ap.add_argument("--sides", choices=["both", "reference", "ours"],
                    default="both")
    ap.add_argument("--match-global-batch", action="store_true",
                    help="divide our per-replica batch by the mesh size "
                         "so both sides run the same global batch and "
                         "step count (see run_ours docstring)")
    ap.add_argument("--log", default="bench_logs/head2head_runs.jsonl")
    ap.add_argument("--out", default="bench_logs/head2head_summary.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_num_cpu_devices", args.cpu)
        jax.config.update("jax_platforms", "cpu")

    from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset

    root = tempfile.mkdtemp(prefix="head2head_")
    log_dir = os.path.join(root, "logs")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    # the exact validate_ssl fixture: 8 labeled / 96 unlabeled / 16 valid /
    # 32 test records, length 2500, dataset seed 11
    data = make_synthetic_dataset(
        root, num_train_labeled=8, num_train_unlabeled=96,
        num_valid=16, num_test=32, length=2500, seed=11,
    )

    results = {}
    for algo in args.algorithms:
        results[algo] = {"reference": [], "ours": []}
        for seed in args.seeds:
            for side in ("reference", "ours"):
                if args.sides not in ("both", side):
                    continue
                t0 = time.time()
                try:
                    if side == "reference":
                        miou, dt = run_reference(
                            algo, f"ref_{algo}_s{seed}", root, data,
                            args.epochs, seed, log_dir)
                    else:
                        bpr = None
                        if args.match_global_batch:
                            import jax

                            bpr = max(1, 4 // jax.device_count())
                        miou, dt = run_ours(
                            algo, f"ours_{algo}_s{seed}", root, data,
                            args.epochs, seed, batch_per_replica=bpr)
                    rec = {"side": side, "algorithm": algo, "seed": seed,
                           "epochs": args.epochs, "MeanIoU": miou,
                           "wall_s": round(dt, 1)}
                except Exception as e:  # one bad run must not kill the study
                    miou = None
                    rec = {"side": side, "algorithm": algo, "seed": seed,
                           "epochs": args.epochs, "MeanIoU": None,
                           "wall_s": round(time.time() - t0, 1),
                           "error": f"{type(e).__name__}: {e}"}
                results[algo][side].append(miou)
                print("RESULT", json.dumps(rec), flush=True)
                with open(args.log, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    import numpy as np

    summary = {}
    for algo, sides in results.items():
        row = {}
        for side, vals in sides.items():
            vals = [v for v in vals if v is not None]
            if vals:
                row[side] = {"mean": round(float(np.mean(vals)), 4),
                             "std": round(float(np.std(vals)), 4),
                             "seeds": [round(v, 4) for v in vals]}
        if "reference" in row and "ours" in row:
            row["delta"] = round(row["ours"]["mean"] - row["reference"]["mean"], 4)
        summary[algo] = row
    with open(args.out, "w") as f:
        json.dump({"epochs": args.epochs, "seeds": args.seeds,
                   "summary": summary}, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
