"""Native C++ data-kernel goldens vs scipy (native/ecgdata.cpp).

Skipped when the library hasn't been built (``make -C native``)."""

import numpy as np
import pytest
from scipy.interpolate import interp1d
from scipy.signal import butter, resample, sosfiltfilt

from semi_seg_ecg_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libecgdata.so not built"
)


@pytest.mark.parametrize("m", [1250, 2500, 5000, 1237, 3333, 2501, 7])
def test_resample_fourier_matches_scipy(rng, m):
    x = rng.standard_normal((1, 2500))
    np.testing.assert_allclose(
        native.resample_fourier(x, m), resample(x, m, axis=1),
        atol=1e-10, rtol=1e-10,
    )


@pytest.mark.parametrize("n", [2500, 1000, 777])
def test_resample_fourier_varied_input_lengths(rng, n):
    x = rng.standard_normal((2, n))
    np.testing.assert_allclose(
        native.resample_fourier(x, 1234), resample(x, 1234, axis=1),
        atol=1e-10,
    )


@pytest.mark.parametrize("btype,cutoff", [("highpass", 0.67), ("lowpass", 40)])
def test_sosfiltfilt_matches_scipy(rng, btype, cutoff):
    x = rng.standard_normal((1, 2500))
    sos = butter(5, cutoff, btype=btype, fs=250, output="sos")
    np.testing.assert_allclose(
        native.sosfiltfilt(sos, x), sosfiltfilt(sos, x), atol=1e-10,
    )


@pytest.mark.parametrize("order", [2, 3, 5, 8])
def test_sosfiltfilt_orders(rng, order):
    x = rng.standard_normal((1, 1000))
    sos = butter(order, [1.0, 35.0], btype="bandpass", fs=250, output="sos")
    np.testing.assert_allclose(
        native.sosfiltfilt(sos, x), sosfiltfilt(sos, x), atol=1e-9,
    )


@pytest.mark.parametrize("kind", ["nearest", "zero"])
@pytest.mark.parametrize("n,m", [(500, 237), (500, 1000), (2500, 625),
                                 (100, 333), (500, 250)])
def test_label_resampling_matches_scipy(rng, kind, n, m):
    y = rng.integers(0, 4, (1, n)).astype(float)
    f = interp1d(np.arange(n), y, axis=1, kind=kind,
                 fill_value="extrapolate")
    ref = f(np.linspace(0, n - 1, m))
    np.testing.assert_array_equal(native.resample_labels(y, m, kind), ref)


def test_standardize_matches_reference(rng):
    x = rng.standard_normal((1, 2500))
    ref = (x - x.mean()) / x.std()
    np.testing.assert_allclose(native.standardize(x), ref, atol=1e-12)


def test_standardize_zero_std():
    x = np.full((1, 100), 2.5)
    np.testing.assert_array_equal(native.standardize(x), np.zeros((1, 100)))


def test_transforms_use_native_consistently(rng):
    """The transform library must give identical results with and without
    the native path (it dispatches internally)."""
    import os

    import semi_seg_ecg_tpu.data.transforms as T

    x = rng.standard_normal((1, 2500))
    y = rng.integers(0, 4, (1, 2500)).astype(np.int64)
    hp = T.HighpassFilter(fs=250, cutoff=0.67)
    out_native = hp(x)
    sos = butter(5, 0.67, btype="highpass", fs=250, output="sos")
    np.testing.assert_allclose(out_native, sosfiltfilt(sos, x), atol=1e-10)

    rrc = T.RandomResizeCrop(target_length=2500)
    xa, ya = rrc(x, y, rng=np.random.default_rng(7))
    assert xa.shape == (1, 2500) and ya.shape == (1, 2500)
