"""Transform library parity tests vs reference semantics (scipy golden)."""

import numpy as np
import pytest
from scipy.interpolate import interp1d
from scipy.signal import butter, resample, sosfiltfilt

import semi_seg_ecg_tpu.data.transforms as T


def test_standardize_matches_reference_semantics(rng):
    x = rng.standard_normal((1, 100))
    out = T.Standardize(axis=(-1, -2))(x)
    np.testing.assert_allclose(out.mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(out.std(), 1.0, atol=1e-12)


def test_standardize_zero_std_guard():
    x = np.full((1, 50), 3.0)
    out = T.Standardize()(x)
    np.testing.assert_array_equal(out, np.zeros_like(x))


def test_resample_fourier_matches_scipy(rng):
    x = rng.standard_normal((1, 500))
    out = T.Resample(target_length=250)(x)
    np.testing.assert_allclose(out, resample(x, 250, axis=1))


def test_resample_label_zero_order_hold(rng):
    y = rng.integers(0, 4, size=(1, 500)).astype(float)
    out = T.Resample(target_length=250, method="interp", kind="zero")(y)
    f = interp1d(np.arange(500), y, axis=1, kind="zero",
                 fill_value="extrapolate")
    expected = f(np.linspace(0, 499, 250))
    np.testing.assert_allclose(out, expected)
    # zero-order hold must not invent classes
    assert set(np.unique(out)).issubset(set(np.unique(y)))


def test_resample_target_fs(rng):
    x = rng.standard_normal((1, 1000))
    out = T.Resample(target_fs=250)(x, fs=500)
    assert out.shape == (1, 500)
    np.testing.assert_allclose(out, resample(x, 500, axis=1))


def test_sos_filters_match_scipy(rng):
    x = rng.standard_normal((1, 2500))
    hp = T.HighpassFilter(fs=250, cutoff=0.67)
    lp = T.LowpassFilter(fs=250, cutoff=40)
    sos_hp = butter(5, 0.67, btype="highpass", fs=250, output="sos")
    sos_lp = butter(5, 40, btype="lowpass", fs=250, output="sos")
    np.testing.assert_allclose(hp(x), sosfiltfilt(sos_hp, x))
    np.testing.assert_allclose(lp(x), sosfiltfilt(sos_lp, x))


def test_random_resize_crop_shapes_and_label_alignment(rng):
    x = rng.standard_normal((1, 2500))
    y = np.repeat(rng.integers(0, 4, size=(1, 125)), 20, axis=1).astype(np.int64)
    t = T.RandomResizeCrop(target_length=2500, scale_min=0.5, scale_max=2.0)
    for _ in range(5):
        xc, yc = t(x, y, rng=rng)
        assert xc.shape == (1, 2500)
        assert yc.shape == (1, 2500)
        assert set(np.unique(yc)).issubset({0, 1, 2, 3})


def test_crops(rng):
    x = rng.standard_normal((1, 100))
    y = rng.integers(0, 4, size=(1, 100))
    xc, yc = T.RandomCrop(50)(x, y, rng=rng)
    assert xc.shape == (1, 50) and yc.shape == (1, 50)
    xc, yc = T.CenterCrop(50)(x, y, rng=rng)
    np.testing.assert_array_equal(xc, x[:, 25:75])
    np.testing.assert_array_equal(yc, y[:, 25:75])
    xm = T.MovingWindowCrop(50, 25)(x, rng=rng)
    assert xm.shape == (3, 1, 50)
    xn, yn = T.NCrop(50, 3)(x, y, rng=rng)
    assert xn.shape == (3, 1, 50)
    np.testing.assert_array_equal(xn[0], x[:, :50])
    np.testing.assert_array_equal(xn[-1], x[:, 50:])


def test_crop_validation():
    with pytest.raises(ValueError):
        T.RandomCrop(200)(np.zeros((1, 100)))
    with pytest.raises(ValueError):
        T.RandomCrop(50)(np.zeros((1, 100)), np.zeros((1, 99)))


def test_label_changeable_flags():
    # parity with reference's label-aware vs signal-only split
    # (transforms.py:315-332,707-718)
    assert T.XFlip.label_changeable
    assert T.Cutout.label_changeable
    assert T.RandomShift.label_changeable
    assert T.RandomResizeCrop.label_changeable
    assert not T.YFlip.label_changeable
    assert not T.AmplitudeScaling.label_changeable
    assert not T.WhiteNoise.label_changeable


def test_signal_only_aug_passes_label_through(rng):
    x = rng.standard_normal((1, 100))
    y = rng.integers(0, 4, size=(1, 100))
    x2, y2 = T.YFlip()(x, y, rng=rng)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(x2, -x)


def test_xflip_flips_both(rng):
    x = rng.standard_normal((1, 100))
    y = rng.integers(0, 4, size=(1, 100))
    x2, y2 = T.XFlip()(x, y, rng=rng)
    np.testing.assert_array_equal(x2, x[:, ::-1])
    np.testing.assert_array_equal(y2, y[:, ::-1])


def test_cutout_zeroes_joint_span(rng):
    x = np.ones((1, 100))
    y = np.ones((1, 100), dtype=np.int64)
    x2, y2 = T.Cutout(mask_ratio=0.5)(x, y, rng=rng)
    np.testing.assert_array_equal(x2 == 0, y2 == 0)
    assert x is not x2 and (y == 1).all()  # purity: input not mutated


def test_random_shift_consistency(rng):
    x = np.arange(100, dtype=float)[None]
    y = np.arange(100, dtype=np.int64)[None]
    x2, y2 = T.RandomShift(mask_ratio=0.5)(x, y, rng=rng)
    # the nonzero region must still satisfy x == y (same shift applied)
    nz = x2 != 0
    np.testing.assert_array_equal(x2[nz], y2[nz].astype(float))


def test_noise_ops_shapes(rng):
    x = rng.standard_normal((1, 500))
    for op in [
        T.AdaptivePowerlineNoise(fs=250),
        T.SineNoise(),
        T.SquareNoise(),
        T.WhiteNoise(),
        T.RandomPartialSineNoise(amplitude=1, ratio=0.5),
        T.RandomPartialSquareNoise(amplitude=1, ratio=0.5),
        T.RandomPartialWhiteNoise(amplitude=1, ratio=0.5),
        T.RandomBaselineShift(),
        T.AmplitudeScaling(0.5),
        T.RandomMask(0.3),
    ]:
        out = op(x, rng=rng)
        assert out.shape == x.shape


def test_partial_noise_is_partial(rng):
    x = np.zeros((1, 1000))
    op = T.RandomPartialWhiteNoise(amplitude=1, ratio=0.5)
    out = op(x, rng=rng)
    changed = (out != 0).sum()
    assert changed <= 500  # at most ratio * T samples touched


def test_rand_augment_selection(rng):
    ops = [T.AmplitudeScaling(0.5), T.WhiteNoise(), T.SineNoise(),
           T.SquareNoise()]
    ra = T.RandAugment(ops=ops, level=10, num_layers=3, prob=1.0)
    x = rng.standard_normal((1, 100))
    out = ra(x, rng=rng)
    assert out.shape == x.shape
    # set_level was applied
    assert ops[0].sigma == 0.5


def test_random_apply_prob(rng):
    x = np.ones((1, 10))
    never = T.RandomApply(T.YFlip(), prob=0.0)
    always = T.RandomApply(T.YFlip(), prob=1.0)
    np.testing.assert_array_equal(never(x, rng=rng), x)
    np.testing.assert_array_equal(always(x, rng=rng), -x)


def test_get_transforms_from_config_full_surface():
    cfg = [
        {"highpass_filter": {"fs": 250, "cutoff": 0.67}},
        {"lowpass_filter": {"fs": 250, "cutoff": 40}},
        {"standardize": {"axis": [-1, -2]}},
        {"to_tensor": {"dtype": "float"}},
        "yflip",
        {"RandomApply": {"transform": "xflip", "prob": 0.5}},
        {"RandAugment": {
            "ops": [
                {"AmplitudeScaling": {"sigma": 0.5}},
                {"AdaptivePowerlineNoise": {"fs": 250}},
                {"RandomPartialWhiteNoise": {"amplitude": 1, "ratio": 0.5}},
                {"RandomPartialSineNoise": {"amplitude": 1, "ratio": 0.5}},
            ],
            "level": 10, "num_layers": 3, "prob": 0.5,
        }},
    ]
    built = T.get_transforms_from_config(cfg)
    assert len(built) == 7
    assert isinstance(built[0], T.HighpassFilter)
    assert isinstance(built[5], T.RandomApply)
    assert isinstance(built[6], T.RandAugment)
    with pytest.raises(ValueError):
        T.get_transforms_from_config(["not_a_transform"])
    assert T.get_transforms_from_config([]) is None


def test_determinism_same_rng_same_result():
    x = np.random.default_rng(1).standard_normal((1, 500))
    op = T.RandomResizeCrop(500)
    a = op(x, rng=np.random.default_rng(42))
    b = op(x, rng=np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)


def test_ncrop_degenerate_geometries(rng):
    from semi_seg_ecg_tpu.data.transforms import NCrop

    x = rng.standard_normal((1, 100))
    # single segment: one window, no ZeroDivisionError
    out = NCrop(crop_length=50, num_segments=1)(x, rng=rng)
    assert out.shape == (1, 50)
    # more segments than spare samples: evenly spaced unique starts
    out = NCrop(crop_length=98, num_segments=10)(x, rng=rng)
    assert out.shape[-1] == 98 and out.ndim in (2, 3)
    # exact fit: single zero start
    out = NCrop(crop_length=100, num_segments=4)(x, rng=rng)
    assert out.shape == (1, 100)


def test_resample_joint_with_labels(rng):
    """'resample' inside a labeled pipeline receives labels positionally —
    it must resize both, labels via nearest (was: ValueError on the array
    lands in the fs parameter)."""
    from semi_seg_ecg_tpu.data.transforms import Compose, Resample

    x = rng.standard_normal((1, 100))
    y = rng.integers(0, 4, (1, 100))
    t = Compose([Resample(target_length=50)])
    xo, yo = t(x, y, rng=rng)
    assert xo.shape == (1, 50) and yo.shape == (1, 50)
    assert yo.dtype == y.dtype
    assert set(np.unique(yo)) <= set(np.unique(y))


def test_pipeline_without_native_lib(monkeypatch):
    """The pure-Python wheel ships no libecgdata.so; every native-kernel
    consumer must fall back to scipy and produce the SAME output."""
    from semi_seg_ecg_tpu.data import native
    from semi_seg_ecg_tpu.data.transforms import (
        Compose, get_transforms_from_config,
    )

    cfg = [
        {"highpass_filter": {"fs": 250, "cutoff": 0.67}},
        {"lowpass_filter": {"fs": 250, "cutoff": 40}},
        {"standardize": {"axis": [-1, -2]}},
    ]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2500)).astype(np.float64)

    with_native = np.asarray(Compose(get_transforms_from_config(cfg))(
        x.copy(), rng=np.random.default_rng(1)))

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    assert not native.available()
    without = np.asarray(Compose(get_transforms_from_config(cfg))(
        x.copy(), rng=np.random.default_rng(1)))

    # the native path is parity-tested to ~fp tolerance elsewhere; here the
    # contract is the fallback exists and agrees
    np.testing.assert_allclose(without, with_native, atol=1e-10)
