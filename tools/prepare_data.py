"""WFDB → pkl/CSV dataset preparation.

The reference delegates raw-data preprocessing to an external repo
(README.md:65: WFDB records are converted offline into the pkl-per-record +
index-CSV layout the dataset consumes). This tool provides that capability
in-tree: given a directory of WFDB records with delineation annotations, it
writes ``{out}/ecg/*.pkl``, ``{out}/label/*.pkl`` and ``{out}/index/*.csv``
compatible with ``build_seg_dataset``.

Uses the installed ``wfdb`` package when present (declared but unused by
the reference, requirements.txt:14); otherwise falls back to the vendored
pure-Python reader (``semi_seg_ecg_tpu.data.wfdb_io``) — no optional
dependencies needed.

Usage:
  python tools/prepare_data.py --records_dir DIR --out_dir DIR \
      [--lead 0] [--symbol_map p=1,N=2,t=3] [--splits 0.7,0.15,0.15]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DEFAULT_SYMBOL_MAP = {"p": 1, "N": 2, "t": 3}  # P-wave / QRS / T-wave


def annotations_to_mask(ann, length: int, symbol_map) -> np.ndarray:
    """Expand WFDB '(' symbol ')' triplets into a dense per-sample mask."""
    mask = np.zeros(length, dtype=np.int64)
    samples, symbols = list(ann.sample), list(ann.symbol)
    i = 0
    while i < len(symbols):
        if symbols[i] == "(" and i + 1 < len(symbols):
            sym = symbols[i + 1]
            onset = samples[i]
            # find closing ')'
            j = i + 2
            while j < len(symbols) and symbols[j] != ")":
                j += 1
            offset = samples[j] if j < len(symbols) else samples[i + 1]
            cls = symbol_map.get(sym)
            if cls is not None:
                mask[max(onset, 0):min(offset + 1, length)] = cls
            i = j + 1
        else:
            i += 1
    return mask


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--records_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--lead", type=int, default=0)
    ap.add_argument("--ann_ext", default="atr",
                    help="annotation extension holding delineation symbols")
    ap.add_argument("--symbol_map", default="p=1,N=2,t=3")
    ap.add_argument("--splits", default="0.7,0.15,0.15",
                    help="train,valid,test fractions")
    ap.add_argument("--labeled_ratio", type=float, default=1.0,
                    help="fraction of train kept labeled (rest → unlabeled)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prefix", default="DATA")
    args = ap.parse_args(argv)

    try:
        import wfdb  # the real package wins when installed
    except ImportError:
        # vendored pure-Python reader (formats 80/16/61/212/24/32 + MIT
        # annotations — everything the target delineation datasets use),
        # so this tool runs with zero optional dependencies
        from semi_seg_ecg_tpu.data import wfdb_io as wfdb
    import pandas as pd

    symbol_map = {}
    for pair in args.symbol_map.split(","):
        k, v = pair.split("=")
        symbol_map[k] = int(v)

    ecg_dir = os.path.join(args.out_dir, "ecg")
    label_dir = os.path.join(args.out_dir, "label")
    index_dir = os.path.join(args.out_dir, "index")
    for d in (ecg_dir, label_dir, index_dir):
        os.makedirs(d, exist_ok=True)

    record_names = sorted({
        os.path.splitext(f)[0]
        for f in os.listdir(args.records_dir) if f.endswith(".hea")
    })
    rows = []
    for name in record_names:
        path = os.path.join(args.records_dir, name)
        record = wfdb.rdrecord(path)
        sig = np.asarray(record.p_signal)[:, args.lead].astype(np.float64)
        ann = wfdb.rdann(path, args.ann_ext)
        mask = annotations_to_mask(ann, len(sig), symbol_map)
        with open(os.path.join(ecg_dir, f"{name}.pkl"), "wb") as f:
            pickle.dump(sig, f)
        with open(os.path.join(label_dir, f"{name}_label.pkl"), "wb") as f:
            pickle.dump(mask, f)
        rows.append({"waveform": f"{name}.pkl", "label": f"{name}_label.pkl",
                     "fs": int(record.fs)})

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(rows))
    fr_train, fr_valid, _ = [float(x) for x in args.splits.split(",")]
    n_train = int(len(rows) * fr_train)
    n_valid = int(len(rows) * fr_valid)
    train = [rows[i] for i in order[:n_train]]
    valid = [rows[i] for i in order[n_train:n_train + n_valid]]
    test = [rows[i] for i in order[n_train + n_valid:]]
    n_labeled = max(int(len(train) * args.labeled_ratio), 1)
    labeled, unlabeled = train[:n_labeled], train[n_labeled:]

    p = args.prefix
    pd.DataFrame(labeled).to_csv(
        os.path.join(index_dir, f"{p}_train_labeled.csv"), index=False)
    pd.DataFrame(unlabeled or labeled).to_csv(
        os.path.join(index_dir, f"{p}_train_unlabeled.csv"), index=False)
    pd.DataFrame(valid).to_csv(
        os.path.join(index_dir, f"{p}_valid.csv"), index=False)
    pd.DataFrame(test).to_csv(
        os.path.join(index_dir, f"{p}_test.csv"), index=False)
    print(f"wrote {len(rows)} records → {args.out_dir} "
          f"({len(labeled)} labeled / {len(unlabeled)} unlabeled / "
          f"{len(valid)} valid / {len(test)} test)")


if __name__ == "__main__":
    main()
