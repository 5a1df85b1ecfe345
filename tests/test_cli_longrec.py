"""Long-record CLI surface (semi_seg_ecg_tpu.cli.infer_longrec_main,
installed as ``ecg-infer-longrec`` / ``tools/infer_longrec.py``).

Contracts:
- a config + checkpoint + raw ``.npy`` record produce full-length
  ``probs.npy``/``labels.npy`` (+ ``intervals.csv`` with ``--intervals``);
- a WFDB record drives the vendored reader path end to end;
- directory mode processes every record through ONE loaded model into
  ``out-dir/<stem>/``;
- ``--eval-labels`` prints the delineation table (perfect self-score);
- lead-count mismatches fail loudly, not with a shape error downstream.
"""

import csv
import os

import numpy as np
import pytest
import yaml

from semi_seg_ecg_tpu.algorithms.common import init_model_state
from semi_seg_ecg_tpu.cli import infer_longrec_main, load_record
from semi_seg_ecg_tpu.models import build_model_from_config
from semi_seg_ecg_tpu.utils import checkpoint as ckpt

from tests.test_models import RESNET_CFG

SIG = 256


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("longrec_cli")
    config = {
        **{k: dict(v) if isinstance(v, dict) else v
           for k, v in RESNET_CFG.items()},
        "seed": 6,
        "dataset": {
            "signal_length": SIG,
            "filter": [{"highpass_filter": {"fs": 250, "cutoff": 0.67}}],
            "transforms": [{"standardize": {"axis": [-1, -2]}},
                           {"to_tensor": {"dtype": "float"}}],
        },
        "test": {"model_path": str(root / "model.ckpt"),
                 "target_metric": "MeanIoU"},
        "output_dir": str(root), "exp_name": "exp",
    }
    model = build_model_from_config(config, train=False, serving=True)
    ms = init_model_state(model, config, seed=6)
    ckpt.save_checkpoint(str(root / "model.ckpt"), epoch=0, model_state=ms)
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.dump(config))
    rng = np.random.default_rng(0)
    rec = rng.standard_normal(int(5.3 * SIG)).astype(np.float32)
    np.save(root / "rec.npy", rec)
    return str(cfg_path), str(root), rec


def test_single_record_with_intervals(cli_setup):
    cfg, root, rec = cli_setup
    out = os.path.join(root, "out1")
    infer_longrec_main(["-f", cfg, "--record", os.path.join(root, "rec.npy"),
                        "--batch", "4", "--out-dir", out, "--intervals"])
    probs = np.load(os.path.join(out, "probs.npy"))
    labels = np.load(os.path.join(out, "labels.npy"))
    assert probs.shape == (4, rec.size) and labels.shape == (rec.size,)
    np.testing.assert_allclose(probs.sum(axis=0), 1.0, atol=1e-4)
    with open(os.path.join(out, "intervals.csv")) as f:
        rows = list(csv.DictReader(f))
    for r in rows[:5]:
        c, on, off = int(r["class"]), int(r["onset"]), int(r["offset"])
        assert (labels[on:off] == c).all()


def test_eval_labels_self_score(cli_setup, capsys):
    cfg, root, rec = cli_setup
    out = os.path.join(root, "out2")
    # self-score: first produce the labels, then evaluate against them
    infer_longrec_main(["-f", cfg, "--record", os.path.join(root, "rec.npy"),
                        "--batch", "4", "--out-dir", out])
    truth = os.path.join(out, "labels.npy")
    infer_longrec_main(["-f", cfg, "--record", os.path.join(root, "rec.npy"),
                        "--batch", "4", "--out-dir", out,
                        "--eval-labels", truth])
    text = capsys.readouterr().out
    assert "overall" in text and "Se 1.000" in text and "PPV 1.000" in text


WFDB_GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures", "wfdb", "golden")


def test_wfdb_record_path(cli_setup, capsys):
    cfg, root, _ = cli_setup
    out = os.path.join(root, "out_wfdb")
    infer_longrec_main(["-f", cfg, "--record", WFDB_GOLDEN,
                        "--lead", "0", "--batch", "4", "--out-dir", out])
    n = load_record(WFDB_GOLDEN).shape[1]
    assert np.load(os.path.join(out, "probs.npy")).shape == (4, n)
    # WFDB input supplies its own sampling rate when --fs is omitted
    assert "record's own sampling rate" in capsys.readouterr().out


def test_directory_mode(cli_setup):
    cfg, root, rec = cli_setup
    rec_dir = os.path.join(root, "recdir")
    os.makedirs(rec_dir, exist_ok=True)
    np.save(os.path.join(rec_dir, "a.npy"), rec[:2 * SIG])
    np.save(os.path.join(rec_dir, "b.npy"), rec[:2 * SIG] * 0.5)
    out = os.path.join(root, "out_dir")
    infer_longrec_main(["-f", cfg, "--record", rec_dir,
                        "--batch", "4", "--out-dir", out])
    for stem in ("a", "b"):
        p = np.load(os.path.join(out, stem, "probs.npy"))
        assert p.shape == (4, 2 * SIG)
    with pytest.raises(SystemExit, match="single record"):
        infer_longrec_main(["-f", cfg, "--record", rec_dir,
                            "--out-dir", out, "--eval-labels", "x.npy"])
    # same stem, different extension: would overwrite — rejected loudly
    import pickle

    with open(os.path.join(rec_dir, "a.pkl"), "wb") as f:
        pickle.dump(rec[:2 * SIG], f)
    with pytest.raises(SystemExit, match="overwrite"):
        infer_longrec_main(["-f", cfg, "--record", rec_dir,
                            "--out-dir", out])
    os.remove(os.path.join(rec_dir, "a.pkl"))


def test_lead_mismatch_fails_loudly(cli_setup):
    cfg, root, _ = cli_setup
    two = np.zeros((2, 3 * SIG), np.float32)
    np.save(os.path.join(root, "two.npy"), two)
    with pytest.raises(SystemExit, match="pass --lead"):
        infer_longrec_main(["-f", cfg,
                            "--record", os.path.join(root, "two.npy"),
                            "--out-dir", os.path.join(root, "out3")])
