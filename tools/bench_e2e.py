"""Whole-system training throughput: loader + H2D + train step + eval.

The headline ``bench.py`` isolates compute; this tool measures the number a
user actually sees — FixMatch training driven end-to-end through
``run_training`` on a 512-record synthetic LUDB-shaped dataset, across the
input-path modes:

- ``host``          host augmentation (reference-equivalent path)
- ``device``        ``dataset.device_augment`` (raw prefix shipped per step)
- ``device+scan``   + ``train.scan_steps`` (K steps per dispatch)
- ``cache``         + ``dataset.device_cache`` (whole prefix HBM-resident,
                    steps ship int32 indices only)
- ``cache+scan``    both

Timing is in-run: ONE training of N epochs per mode, each epoch's train
loop individually timed (eval excluded), steady state = median of the
epochs after the warmup tail. Everything that wrecked the earlier two-run
slope design cancels by construction: compile happens once (the remote
tunnel's compile latency drifts 15 s -> 190 s between runs, NOTES.md —
a two-point fit across separate compiles measured THAT, producing
negative slopes), the D2H first-fetch handshake is paid once, and the
prefix/file caches fill in epoch 0.

Run: ``python tools/bench_e2e.py [--modes host,cache+scan] [--length 2500]``
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _flagship_config  # noqa: E402

MODES = ("host", "device", "device+scan", "cache", "cache+scan")


def make_config(data_cfg, out_dir, mode, epochs, length, scan_steps):
    config = _flagship_config(signal_length=length)
    config.update({
        # out_dir None disables checkpoints/TB entirely: this benchmark
        # measures the INPUT PATH (loader + transfers + step + eval); on a
        # slow host link per-epoch best-checkpoint fetches would otherwise
        # dominate every mode equally (pass --artifacts to include them)
        "output_dir": out_dir,
        "exp_name": f"bench_{mode.replace('+', '_')}_{epochs}",
        "resume": None,
        "start_epoch": 0,
        "use_amp": True,
        "pretrained_backbone": None,
        "test": {"target_metric": "MeanIoU"},
        "async_checkpoint": True,
    })
    from tools.gen_configs import flagship_data_recipe

    config["dataset"] = {
        **data_cfg,
        "signal_length": length,
        "device_augment": mode != "host",
        "device_cache": mode.startswith("cache"),
        # the one flagship recipe definition (tools/gen_configs.py)
        **flagship_data_recipe(length),
    }
    config["dataloader"] = {"batch_size": 16, "num_workers": 8}
    config["train"]["epochs"] = epochs
    config["train"]["warmup_epochs"] = 0
    if mode.endswith("scan"):
        config["train"]["scan_steps"] = scan_steps
    config["metric"].update({
        "include_background": True, "per_class": False,
        "input_format": "one-hot",
    })
    return config


def run_timed(data_cfg, out_dir, mode, epochs, length, scan_steps):
    """One training run; returns the per-epoch train-loop durations.

    The epoch timer wraps ``common._train_one_epoch`` in-process, so the
    numbers cover exactly the input path under test (loader + H2D +
    steps), not the per-epoch eval or checkpoint machinery."""
    import semi_seg_ecg_tpu.algorithms.common as common
    from semi_seg_ecg_tpu.algorithms import get_algorithm

    config = make_config(data_cfg, out_dir, mode, epochs, length, scan_steps)
    times = []
    orig = common._train_one_epoch

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        times.append(time.perf_counter() - t0)
        return out

    common._train_one_epoch = timed
    try:
        get_algorithm("fixmatch").train(config)
    finally:
        common._train_one_epoch = orig
    print(f"# {mode}: epochs {[round(t, 2) for t in times]} s",
          file=sys.stderr, flush=True)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--length", type=int, default=2500)
    ap.add_argument("--records", type=int, default=512)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=8,
                    help="epochs per mode; the first --warm are discarded")
    ap.add_argument("--warm", type=int, default=2,
                    help="warmup epochs excluded from the median (compile, "
                         "handshake, cache fill land in epoch 0)")
    ap.add_argument("--artifacts", action="store_true",
                    help="write checkpoints/TB during timed runs (off by "
                         "default: they measure the host link, not the "
                         "input path)")
    args = ap.parse_args()

    from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset
    from semi_seg_ecg_tpu.utils.logging import set_logging_enabled

    # link-health preamble: the recorded table is only quotable alongside
    # the state of the remote-device link it was measured through
    # (VERDICT r2 #8; NOTES.md "Environment pitfalls")
    from bench import probe_link

    link = probe_link()
    print(json.dumps({"link": link}), flush=True)

    root = tempfile.mkdtemp(prefix="bench_e2e_")
    data_cfg = make_synthetic_dataset(
        os.path.join(root, "data"), num_train_labeled=64,
        num_train_unlabeled=args.records, num_valid=8, num_test=8,
        length=args.length, seed=0,
    )
    steps_per_epoch = args.records // 16
    set_logging_enabled(False)  # keep the per-epoch meter quiet

    import statistics

    results = {}
    for mode in args.modes.split(","):
        out = root if args.artifacts else None
        times = run_timed(data_cfg, out, mode, args.epochs, args.length,
                          args.scan_steps)
        steady_epochs = times[args.warm:]
        if steady_epochs:
            steady = statistics.median(steady_epochs)
            row = {"samples_per_sec":
                   round(steps_per_epoch * 16 / steady, 1),
                   "sec_per_epoch": round(steady, 2),
                   "epoch_times_s": [round(t, 2) for t in times]}
        else:
            row = {"samples_per_sec": None, "sec_per_epoch": None,
                   "error": "no steady epochs (epochs <= warm)"}
        results[mode] = row["samples_per_sec"]
        print(json.dumps({"mode": mode, **row}), flush=True)
    # re-probe: the link state can change over a multi-minute sweep, and a
    # table measured across a degradation is only quotable with both ends
    print(json.dumps({"metric": "fixmatch_e2e_samples_per_sec",
                      "results": results, "link_before": link,
                      "link_after": probe_link()}))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
