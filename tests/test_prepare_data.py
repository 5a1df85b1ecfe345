"""WFDB → pkl/CSV ingest: annotation expansion + the full conversion →
train on-ramp (VERDICT r2 #7).

The real ``wfdb`` package is not installed here (and the reference declares
but never imports it, requirements.txt:14), so the e2e test stubs the two
API calls ``prepare_data`` makes (``rdrecord``/``rdann``) with a synthetic
LUDB-shaped fixture, runs the converter end-to-end, and trains one epoch
from its output through the standard config path — proving the ingest
layout matches what ``build_seg_dataset`` (and the reference's
semi_dataset.py:154-199 contract) consume before real WFDB data arrives.
"""

import pickle
import types

import numpy as np

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from prepare_data import DEFAULT_SYMBOL_MAP, annotations_to_mask  # noqa: E402


class FakeAnn:
    def __init__(self, sample, symbol):
        self.sample = sample
        self.symbol = symbol


def test_annotations_to_mask_triplets():
    #        (   p   )    (   N   )    (   t   )
    ann = FakeAnn([5, 7, 10, 20, 22, 25, 30, 33, 38],
                  ["(", "p", ")", "(", "N", ")", "(", "t", ")"])
    mask = annotations_to_mask(ann, 50, DEFAULT_SYMBOL_MAP)
    np.testing.assert_array_equal(np.unique(mask[5:11]), [1])
    np.testing.assert_array_equal(np.unique(mask[20:26]), [2])
    np.testing.assert_array_equal(np.unique(mask[30:39]), [3])
    assert (mask[:5] == 0).all() and (mask[39:] == 0).all()
    assert (mask[11:20] == 0).all()


def test_annotations_unknown_symbols_ignored():
    ann = FakeAnn([5, 7, 10], ["(", "u", ")"])
    mask = annotations_to_mask(ann, 20, DEFAULT_SYMBOL_MAP)
    assert (mask == 0).all()


def test_annotations_clipped_to_length():
    ann = FakeAnn([15, 17, 30], ["(", "N", ")"])
    mask = annotations_to_mask(ann, 20, DEFAULT_SYMBOL_MAP)
    assert (mask[15:20] == 2).all()


def _mask_to_annotations(y: np.ndarray, inv_map):
    """Labels → WFDB '(' sym ')' triplets (inverse of annotations_to_mask:
    a run [lo, hi) becomes onset=lo, offset=hi-1)."""
    samples, symbols = [], []
    boundaries = np.flatnonzero(np.diff(y) != 0) + 1
    runs = np.split(np.arange(len(y)), boundaries)
    for run in runs:
        cls = int(y[run[0]])
        if cls == 0:
            continue
        samples += [int(run[0]), int(run[len(run) // 2]), int(run[-1])]
        symbols += ["(", inv_map[cls], ")"]
    return samples, symbols


def _install_wfdb_stub(monkeypatch, records):
    """A minimal wfdb module backed by an in-memory record dict."""

    class _Rec:
        def __init__(self, sig, fs):
            # 2 leads: lead 1 is garbage, so --lead 0 selection is observable
            self.p_signal = np.stack([sig, np.full_like(sig, 99.0)], axis=1)
            self.fs = fs

    class _Ann:
        def __init__(self, sample, symbol):
            self.sample = sample
            self.symbol = symbol

    wfdb = types.ModuleType("wfdb")
    wfdb.rdrecord = lambda path: _Rec(*records[os.path.basename(path)][:2])
    wfdb.rdann = lambda path, ext: _Ann(
        *records[os.path.basename(path)][2])
    monkeypatch.setitem(sys.modules, "wfdb", wfdb)


def test_prepare_data_end_to_end_train(tmp_path, monkeypatch):
    """Synthetic WFDB fixture → prepare_data.py → build_seg_dataset →
    1 supervised epoch via the standard config path."""
    from prepare_data import main as prepare_main

    from semi_seg_ecg_tpu.data.synthetic import synth_ecg

    rng = np.random.default_rng(11)
    inv_map = {v: k for k, v in DEFAULT_SYMBOL_MAP.items()}
    records_dir = tmp_path / "records"
    records_dir.mkdir()
    records, masks = {}, {}
    length, fs = 500, 250
    for i in range(12):
        x, y = synth_ecg(rng, length, fs)
        name = f"rec{i:02d}"
        (records_dir / f"{name}.hea").write_text(f"{name} 2 {fs} {length}\n")
        records[name] = (x, fs, _mask_to_annotations(y, inv_map))
        masks[name] = y
    _install_wfdb_stub(monkeypatch, records)

    out = tmp_path / "converted"
    prepare_main([
        "--records_dir", str(records_dir), "--out_dir", str(out),
        "--lead", "0", "--splits", "0.667,0.167,0.166",
        "--labeled_ratio", "0.5", "--prefix", "LUDB",
    ])

    # layout + round-trip: reconstructed labels must equal the source masks
    import pandas as pd

    for split, expect in (("train_labeled", 4), ("train_unlabeled", 4),
                          ("valid", 2), ("test", 2)):
        df = pd.read_csv(out / "index" / f"LUDB_{split}.csv")
        assert len(df) == expect, (split, len(df))
        assert {"waveform", "label", "fs"} <= set(df.columns)
        for _, row in df.iterrows():
            name = row["waveform"][:-len(".pkl")]
            with open(out / "ecg" / row["waveform"], "rb") as f:
                sig = pickle.load(f)
            np.testing.assert_array_equal(sig, records[name][0])
            with open(out / "label" / row["label"], "rb") as f:
                mask = pickle.load(f)
            np.testing.assert_array_equal(mask, masks[name])

    # one supervised epoch through the standard config path
    from test_algorithms_e2e import make_config

    from semi_seg_ecg_tpu.algorithms import get_algorithm

    ds_cfg = {
        "ecg_dir": str(out / "ecg"), "label_dir": str(out / "label"),
        "index_dir": str(out / "index"),
        "train_labeled_csv": "LUDB_train_labeled.csv",
        "train_unlabeled_csv": "LUDB_train_unlabeled.csv",
        "valid_csv": "LUDB_valid.csv", "test_csv": "LUDB_test.csv",
        "filename_col": "waveform", "label_filename_col": "label",
        "fs_col": "fs", "fs": fs, "signal_length": length,
    }
    config = make_config(ds_cfg, tmp_path, "base", epochs=1)
    algo = get_algorithm("base")
    algo.train(config)
    exp = os.path.join(config["output_dir"], config["exp_name"])
    assert os.path.exists(os.path.join(exp, "best-loss.ckpt"))
    metrics = algo.test(config)
    assert np.isfinite(metrics["MeanIoU"])
