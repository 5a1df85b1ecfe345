"""Ops parity tests: interpolation and losses vs torch goldens, metrics
semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.ops.interpolate import linear_interpolate
from semi_seg_ecg_tpu.ops.losses import (
    cross_entropy,
    per_sample_cross_entropy,
    soft_cross_entropy,
)
from semi_seg_ecg_tpu.ops.metrics import (
    MeanIoU,
    DiceScore,
    GeneralizedDiceScore,
    MetricCollection,
    build_metric_fn,
    flatten_metric_dict,
    is_best_metric,
    segmentation_stats,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_len,out_len", [(79, 2500), (100, 2500), (157, 2500),
                                            (2500, 625), (5, 17)])
def test_linear_interpolate_matches_torch(rng, align_corners, in_len, out_len):
    x = rng.standard_normal((2, 4, in_len)).astype(np.float32)
    ours = np.asarray(linear_interpolate(jnp.asarray(x), out_len,
                                         align_corners=align_corners))
    theirs = F.interpolate(torch.from_numpy(x), size=out_len, mode="linear",
                           align_corners=align_corners).numpy()
    # torch computes source coordinates in fp32, we use fp64 (more accurate);
    # residual mismatch is bounded by one fp32-ulp of coordinate per point
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)


def test_linear_interpolate_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 10)).astype(np.float32))
    assert linear_interpolate(x, 10) is x


@pytest.mark.parametrize("align_corners", [False, True])
def test_linear_interpolate_gather_path_matches_matmul(rng, align_corners):
    """Long-record sizes switch to the O(out) two-gather path
    (_MATMUL_MAX_ENTRIES); it must agree with the matmul formulation
    bit-for-bit up to summation order."""
    from semi_seg_ecg_tpu.ops import interpolate as I

    in_len, out_len = 640, 4096
    assert in_len * out_len <= I._MATMUL_MAX_ENTRIES
    x = jnp.asarray(rng.standard_normal((2, 3, in_len)).astype(np.float32))
    via_matmul = np.asarray(
        linear_interpolate(x, out_len, align_corners=align_corners))
    orig = I._MATMUL_MAX_ENTRIES
    try:
        I._MATMUL_MAX_ENTRIES = 0  # force the gather path
        via_gather = np.asarray(
            linear_interpolate(x, out_len, align_corners=align_corners))
    finally:
        I._MATMUL_MAX_ENTRIES = orig
    np.testing.assert_allclose(via_gather, via_matmul, atol=1e-6, rtol=1e-6)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((4, 4, 100)).astype(np.float32)
    labels = rng.integers(0, 4, size=(4, 100))
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(F.cross_entropy(torch.from_numpy(logits),
                                   torch.from_numpy(labels)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_cross_entropy_none_and_mask_matches_torch(rng):
    logits = rng.standard_normal((4, 4, 50)).astype(np.float32)
    labels = rng.integers(0, 4, size=(4, 50))
    mask = rng.random((4, 50)) > 0.5
    ours_none = cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              reduction="none")
    theirs_none = F.cross_entropy(torch.from_numpy(logits),
                                  torch.from_numpy(labels),
                                  reduction="none").numpy()
    np.testing.assert_allclose(np.asarray(ours_none), theirs_none, rtol=1e-5,
                               atol=1e-6)
    # FixMatch composition: (loss_none * mask).mean()
    ours_masked = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                      mask=jnp.asarray(mask)))
    theirs_masked = float((torch.from_numpy(theirs_none)
                           * torch.from_numpy(mask)).mean())
    np.testing.assert_allclose(ours_masked, theirs_masked, rtol=1e-5)


def test_soft_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((4, 4, 50)).astype(np.float32)
    target = rng.random((4, 4, 50)).astype(np.float32)
    target /= target.sum(axis=1, keepdims=True)
    ours = float(soft_cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    theirs = float(F.cross_entropy(torch.from_numpy(logits),
                                   torch.from_numpy(target)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_per_sample_cross_entropy_reconstructs_batch_mean(rng):
    logits = rng.standard_normal((6, 4, 30)).astype(np.float32)
    labels = rng.integers(0, 4, size=(6, 30))
    per = np.asarray(per_sample_cross_entropy(jnp.asarray(logits),
                                              jnp.asarray(labels)))
    total = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(per.mean(), total, rtol=1e-6)


def test_segmentation_stats_counts():
    preds = jnp.asarray([[0, 0, 1, 2], [3, 3, 3, 3]])
    labels = jnp.asarray([[0, 1, 1, 2], [3, 3, 0, 0]])
    inter, psum, tsum = segmentation_stats(preds, labels, 4)
    np.testing.assert_array_equal(np.asarray(inter),
                                  [[1, 1, 1, 0], [0, 0, 0, 2]])
    np.testing.assert_array_equal(np.asarray(psum),
                                  [[2, 1, 1, 0], [0, 0, 0, 4]])
    np.testing.assert_array_equal(np.asarray(tsum),
                                  [[1, 2, 1, 0], [2, 0, 0, 2]])


def _stats_np(preds, labels, num_classes):
    return segmentation_stats(jnp.asarray(preds), jnp.asarray(labels),
                              num_classes)


def test_mean_iou_perfect_prediction():
    labels = np.random.default_rng(0).integers(0, 4, size=(3, 100))
    m = MeanIoU(num_classes=4)
    m.update(*_stats_np(labels, labels, 4))
    # absent classes in a sample give IoU 0 (torchmetrics safe-divide), so
    # perfect prediction is 1.0 only when every class occurs in each sample
    labels_all = np.tile(np.arange(4), (3, 25))
    m.reset()
    m.update(*_stats_np(labels_all, labels_all, 4))
    assert m.compute() == pytest.approx(1.0)


def test_mean_iou_known_value():
    # one sample: 4 classes over 8 points, half correct
    labels = np.array([[0, 0, 1, 1, 2, 2, 3, 3]])
    preds = np.array([[0, 1, 1, 2, 2, 3, 3, 0]])
    # per class: I/U -> 0: 1/3, 1: 1/3, 2: 1/3, 3: 1/3
    m = MeanIoU(num_classes=4)
    m.update(*_stats_np(preds, labels, 4))
    assert m.compute() == pytest.approx(1 / 3)


def test_mean_iou_batch_mean_accumulation():
    # torchmetrics semantics: compute = mean over update() calls
    labels = np.tile(np.arange(4), (1, 2))  # (1, 8)
    preds_good = labels.copy()
    preds_bad = (labels + 1) % 4
    m = MeanIoU(num_classes=4)
    m.update(*_stats_np(preds_good, labels, 4))
    m.update(*_stats_np(preds_bad, labels, 4))
    assert m.compute() == pytest.approx(0.5)


def test_mean_iou_include_background_false():
    labels = np.array([[0, 0, 0, 1, 1, 1, 2, 3]])
    preds = np.array([[0, 0, 0, 1, 1, 1, 2, 3]])
    m = MeanIoU(num_classes=4, include_background=False)
    m.update(*_stats_np(preds, labels, 4))
    assert m.compute() == pytest.approx(1.0)


def test_per_class_metrics_and_flatten():
    labels = np.tile(np.arange(4), (2, 2))
    preds = labels.copy()
    m = MeanIoU(num_classes=4, per_class=True)
    m.update(*_stats_np(preds, labels, 4))
    val = m.compute()
    assert val.shape == (4,)
    flat = flatten_metric_dict({"MeanIoU": val})
    assert set(flat) == {"MeanIoU_0", "MeanIoU_1", "MeanIoU_2", "MeanIoU_3"}


def test_dice_score_known_value():
    labels = np.array([[1, 1, 0, 0]])
    preds = np.array([[1, 0, 0, 0]])
    # class0: I=2 P=3 T=2 -> 4/5; class1: I=1 P=1 T=2 -> 2/3; cls 2,3: 0
    m = DiceScore(num_classes=2)
    m.update(*_stats_np(preds, labels, 2))
    assert m.compute() == pytest.approx((4 / 5 + 2 / 3) / 2)


def test_generalized_dice_perfect():
    labels = np.tile(np.arange(4), (2, 4))
    m = GeneralizedDiceScore(num_classes=4)
    m.update(*_stats_np(labels, labels, 4))
    assert m.compute() == pytest.approx(1.0)


def test_build_metric_fn_and_best(rng):
    cfg = {
        "task": "segmentation",
        "compute_on_cpu": True,
        "sync_on_compute": False,
        "num_classes": 4,
        "include_background": True,
        "per_class": False,
        "input_format": "one-hot",
        "target_metrics": ["MeanIoU", {"DiceScore": {"per_class": True}}],
    }
    fn, best = build_metric_fn(cfg)
    assert isinstance(fn, MetricCollection)
    assert set(fn) == {"MeanIoU", "DiceScore"}
    assert fn["DiceScore"].per_class
    assert best["MeanIoU"] == -float("inf")
    assert is_best_metric(fn["MeanIoU"], best["MeanIoU"], 0.1)
    assert not is_best_metric(fn["MeanIoU"], 0.5, 0.4)
    with pytest.raises(AssertionError):
        build_metric_fn({**cfg, "target_metrics": ["NotAMetric"]})
    with pytest.raises(AssertionError):
        build_metric_fn({**cfg, "task": "classification"})


class TestMaxPoolK3S2:
    """ops/pooling.py: the select-and-scatter-free maxpool VJP must be
    bit-exact against jax.grad of nn.max_pool, including first-max tie
    routing (XLA's GE-select semantics)."""

    def _grads(self, x):
        import flax.linen as nn

        from semi_seg_ecg_tpu.ops.pooling import max_pool_k3s2

        ref_fn = lambda v: jnp.sum(
            nn.max_pool(v, (3,), strides=(2,), padding=[(1, 1)]) ** 2)
        new_fn = lambda v: jnp.sum(max_pool_k3s2(v) ** 2)
        return jax.grad(ref_fn)(x), jax.grad(new_fn)(x)

    @pytest.mark.parametrize("t", [8, 9, 2500])
    def test_bit_exact_random(self, t):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, t, 4)).astype(np.float32))
        ref, new = self._grads(x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))

    def test_bit_exact_with_ties(self):
        # quantize to force equal neighbours inside windows — the tie
        # must route to the FIRST maximal element, like XLA's GE select
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.integers(-2, 3, (3, 40, 2)).astype(np.float32))
        ref, new = self._grads(x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))

    def test_forward_matches(self):
        import flax.linen as nn

        from semi_seg_ecg_tpu.ops.pooling import max_pool_k3s2

        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (2, 31, 3)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(max_pool_k3s2(x)),
            np.asarray(nn.max_pool(x, (3,), strides=(2,),
                                   padding=[(1, 1)])))

    def test_bf16(self):
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            (2, 64, 4))).astype(jnp.bfloat16)
        ref, new = self._grads(x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))

    def test_finfo_min_values_do_not_tie_with_padding(self):
        # the pad identity must be -inf: a real finfo.min element would
        # tie with a finfo.min pad and lose its gradient into the pad
        lo = jnp.finfo(jnp.float32).min
        x = jnp.full((1, 6, 1), lo, jnp.float32)
        ref, new = self._grads(x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))
