"""WFDB conversion tool: annotation expansion logic (wfdb-free part)."""

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
