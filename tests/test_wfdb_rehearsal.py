"""Raw-data on-ramp rehearsal: genuine WFDB → prepare → train → test →
long-record CLI with rate conversion, as one pinned chain.

A miniature of ``tools/rehearse_wfdb.py`` (VERDICT r4 #5): records are
written in LUDB's real on-disk format (fmt 16 + fmt 212 .dat, 500 Hz,
per-lead boundary-annotation files), converted by tools/prepare_data.py
through the vendored reader, trained at the shipped-recipe rate (resample
to the signal_length grid — 250 Hz equivalent), and the final stage
segments a RAW .hea record at its native 500 Hz via ``--model-fs``
(Fourier in, zero-order-hold back), scoring boundaries against the
generator's ground truth. Real LUDB arriving is then a data swap.
"""

import numpy as np

from tools.rehearse_wfdb import rehearse


def test_wfdb_rehearsal_chain(tmp_path):
    s = rehearse(str(tmp_path), epochs=2, num_records=24, fs=500,
                 seconds=2.0, algorithm="fixmatch", seed=0, batch_size=1)
    assert 0.0 <= s["test_MeanIoU"] <= 1.0
    assert 0.0 <= s["longrec_overall_sensitivity"] <= 1.0
    assert np.isfinite(s["longrec_overall_ppv"])


def test_wfdb_writer_reader_round_trip(tmp_path):
    """wrsamp/wrann are exact inverses of the vendored readers for both
    container formats (the property the rehearsal rests on)."""
    from semi_seg_ecg_tpu.data import wfdb_io

    rng = np.random.default_rng(3)
    sig = rng.standard_normal((400, 2)) * 1.5
    for fmt in (16, 212):
        base = str(tmp_path / f"rt_{fmt}")
        wfdb_io.wrsamp(base, 500.0, sig, fmt=fmt, gain=200.0,
                       sig_names=["i", "ii"])
        rec = wfdb_io.rdrecord(base)
        assert rec.fs == 500.0 and rec.sig_len == 400 and rec.n_sig == 2
        # quantization error bounded by half an ADC step
        assert np.max(np.abs(rec.p_signal - sig)) <= 0.5 / 200.0 + 1e-12
    samples = np.array([0, 3, 5, 700, 700, 5000])
    symbols = ["(", "p", ")", "(", "N", ")"]
    base = str(tmp_path / "ann")
    wfdb_io.wrann(base, "i", samples, symbols)
    ann = wfdb_io.rdann(base, "i")
    np.testing.assert_array_equal(ann.sample, samples)
    assert ann.symbol == symbols
