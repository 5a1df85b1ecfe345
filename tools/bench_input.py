"""Input-pipeline throughput benchmark.

Measures host-side data-loader throughput (samples/sec) for the FixMatch
pipeline (weak + strong views) on a synthetic LUDB-shaped dataset:

- host path (scipy + native C++ kernels, the default)
- host path with the native library disabled (pure scipy)
- raw-prefix path (what the loader ships when ``device_augment`` moves
  augmentation onto the TPU)

Run: ``python tools/bench_input.py [--samples 512]``.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_loader(data_cfg, batch_size=16, workers=8):
    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
    from semi_seg_ecg_tpu.data.loader import DataLoader

    ds = build_seg_dataset(data_cfg, split="train_unlabeled")
    return DataLoader(ds, batch_size=batch_size, shuffle=True, seed=0,
                      drop_last=True, num_workers=workers)


def run(loader, min_samples):
    # warm the cacheable prefix
    for _ in loader:
        pass
    seen = 0
    t0 = time.perf_counter()
    epoch = 0
    while seen < min_samples:
        epoch += 1
        loader.set_epoch(epoch)
        for batch in loader:
            seen += batch["ecg"].shape[0]
    dt = time.perf_counter() - t0
    return seen / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset

    with tempfile.TemporaryDirectory() as root:
        base = make_synthetic_dataset(root, num_train_labeled=8,
                                      num_train_unlabeled=64, num_valid=4,
                                      num_test=4, length=2500)
        from tools.gen_configs import flagship_data_recipe

        full_cfg = {**base, **flagship_data_recipe(2500)}
        raw_cfg = {**full_cfg, "augmentations": None,
                   "strong_augmentations": None,
                   "transforms": [{"to_tensor": {"dtype": "float"}}]}

        sps = run(build_loader(full_cfg, workers=args.workers), args.samples)
        print(f"host pipeline (native on):  {sps:8.1f} samples/sec")

        os.environ["ECG_DISABLE_NATIVE"] = "1"
        import semi_seg_ecg_tpu.data.native as native

        native._TRIED = False
        native._LIB = None
        sps2 = run(build_loader(full_cfg, workers=args.workers), args.samples)
        print(f"host pipeline (scipy only): {sps2:8.1f} samples/sec")
        del os.environ["ECG_DISABLE_NATIVE"]
        native._TRIED = False
        native._LIB = None

        sps3 = run(build_loader(raw_cfg, workers=args.workers), args.samples)
        print(f"raw prefix (device_augment):{sps3:8.1f} samples/sec")


if __name__ == "__main__":
    main()
