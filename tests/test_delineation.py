"""Delineation post-processing (semi_seg_ecg_tpu/ops/delineation.py).

Contracts:
- run-length interval extraction round-trips with its inverse and drops
  sub-threshold blips;
- boundary matching is greedy-nearest within tolerance, one-to-one, and
  counts FN/FP correctly in crowded and empty cases;
- the metric report reproduces hand-computed sensitivity/PPV/error
  statistics for a label field with known shifts, in ms at the
  configured sampling rate.

The reference computes only per-sample overlap metrics (src/test.py);
this is OUR spec, aligned with the LUDB-paper convention (150 ms
tolerance windows on wave onsets/offsets).
"""

import numpy as np
import pytest

from semi_seg_ecg_tpu.ops import delineation as dl


def _field(total, intervals):
    return dl.intervals_to_labels(intervals, total)


def test_intervals_round_trip_and_min_duration():
    iv = {1: np.array([[10, 20], [40, 41], [60, 80]]),
          2: np.array([[25, 35]])}
    labels = _field(100, iv)
    got = dl.labels_to_intervals(labels)
    np.testing.assert_array_equal(got[1], iv[1])
    np.testing.assert_array_equal(got[2], iv[2])
    # min_duration drops the 1-sample blip at [40, 41)
    got2 = dl.labels_to_intervals(labels, min_duration=2)
    np.testing.assert_array_equal(got2[1], [[10, 20], [60, 80]])
    # classes with no runs still get an empty (0, 2) array
    got3 = dl.labels_to_intervals(labels, classes=[1, 3])
    assert got3[3].shape == (0, 2)
    # boundary runs touching the ends are closed correctly
    edge = dl.labels_to_intervals(np.array([2, 2, 0, 2]))
    np.testing.assert_array_equal(edge[2], [[0, 2], [3, 4]])


def test_match_boundaries_greedy_nearest():
    true = np.array([100, 200, 300])
    pred = np.array([103, 185, 420])
    errors, n_fn, n_fp = dl.match_boundaries(pred, true, tolerance=20)
    # 103→100 (+3), 185→200 (−15); 300 unmatched (FN), 420 unmatched (FP)
    np.testing.assert_array_equal(np.sort(errors), [-15, 3])
    assert (n_fn, n_fp) == (1, 1)
    # a prediction between two true boundaries pairs with the CLOSER one
    errors, n_fn, n_fp = dl.match_boundaries(
        np.array([206]), np.array([200, 210]), tolerance=20)
    np.testing.assert_array_equal(errors, [-4])
    assert (n_fn, n_fp) == (1, 0)
    # one-to-one: two predictions cannot both match one true boundary
    errors, n_fn, n_fp = dl.match_boundaries(
        np.array([198, 203]), np.array([200]), tolerance=20)
    assert errors.size == 1 and abs(errors[0]) == 2
    assert (n_fn, n_fp) == (0, 1)
    # empties
    errors, n_fn, n_fp = dl.match_boundaries(np.array([]), np.array([5]), 10)
    assert errors.size == 0 and (n_fn, n_fp) == (1, 0)


def test_delineation_metrics_hand_computed():
    fs = 250.0  # 1 sample = 4 ms
    true = {1: np.array([[100, 150], [300, 350]]),
            2: np.array([[180, 220]])}
    # class 1: onsets shifted +2 and −3 samples, offsets exact and +5;
    # class 2 interval entirely missed; one spurious class-2 blob
    pred = {1: np.array([[102, 150], [297, 355]]),
            2: np.array([[600, 640]])}
    m = dl.delineation_metrics(_field(700, pred), _field(700, true),
                               fs=fs, tolerance_ms=40.0)  # = 10 samples
    assert m["1_onset"]["sensitivity"] == 1.0
    assert m["1_onset"]["ppv"] == 1.0
    np.testing.assert_allclose(m["1_onset"]["mean_ms"],
                               (2 - 3) / 2 * 4.0)  # −2 ms
    np.testing.assert_allclose(m["1_offset"]["mean_ms"], (0 + 5) / 2 * 4.0)
    assert m["2_onset"]["sensitivity"] == 0.0
    assert m["2_onset"]["ppv"] == 0.0
    assert np.isnan(m["2_onset"]["mean_ms"])
    assert m["2_onset"]["n_true"] == 1 and m["2_onset"]["n_pred"] == 1
    # overall: 4 class-1 boundaries matched of 6 true, 2 spurious pred
    np.testing.assert_allclose(m["overall"]["sensitivity"], 4 / 6)
    np.testing.assert_allclose(m["overall"]["ppv"], 4 / 6)


def test_hallucinated_class_counts_as_false_positives():
    """A class present in the prediction but absent from the truth must
    drag PPV down, not vanish from the report."""
    true = _field(500, {1: np.array([[100, 150]])})
    pred = _field(500, {1: np.array([[100, 150]]),
                        3: np.array([[300, 350]])})
    m = dl.delineation_metrics(pred, true, fs=250.0, tolerance_ms=40.0)
    assert m["3_onset"]["n_true"] == 0 and m["3_onset"]["n_pred"] == 1
    assert m["3_onset"]["ppv"] == 0.0
    np.testing.assert_allclose(m["overall"]["ppv"], 2 / 4)  # 2 TP, 2 FP
    np.testing.assert_allclose(m["overall"]["sensitivity"], 1.0)


def test_blip_filter_applies_to_prediction_only():
    """min_duration cleans predicted blips but never deletes true
    annotation runs — sensitivity is scored against the full truth."""
    true = _field(500, {1: np.array([[100, 103]])})  # a short true run
    pred = _field(500, {1: np.array([[100, 103], [300, 302]])})
    m = dl.delineation_metrics(pred, true, fs=250.0, tolerance_ms=40.0,
                               min_duration=5)
    # the true 3-sample run still counts (as FN here: pred's copy of it
    # was blip-filtered away along with the spurious 2-sample run)
    assert m["1_onset"]["n_true"] == 1 and m["1_onset"]["n_pred"] == 0
    assert m["1_onset"]["sensitivity"] == 0.0


def test_match_boundaries_holter_scale():
    """10^5 boundaries match in O(candidates), not O(n^2) memory."""
    true = np.arange(100_000, dtype=np.int64) * 200  # one per 0.8 s
    pred = true + 3
    errors, n_fn, n_fp = dl.match_boundaries(pred, true, tolerance=37)
    assert errors.size == true.size and n_fn == 0 and n_fp == 0
    assert (errors == 3).all()


def test_tolerance_in_ms_scales_with_fs():
    true = _field(1000, {1: np.array([[500, 600]])})
    pred = _field(1000, {1: np.array([[530, 600]])})  # onset +30 samples
    # 30 samples = 60 ms at fs 500 → inside 150 ms, outside 50 ms
    m = dl.delineation_metrics(pred, true, fs=500.0, tolerance_ms=150.0)
    assert m["1_onset"]["sensitivity"] == 1.0
    m = dl.delineation_metrics(pred, true, fs=500.0, tolerance_ms=50.0)
    assert m["1_onset"]["sensitivity"] == 0.0
