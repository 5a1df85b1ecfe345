"""Radix-select order statistics vs jnp.percentile (ops/select.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_seg_ecg_tpu.ops.select import exact_quantiles, order_statistics


@pytest.mark.parametrize("t", [7, 100, 2500, 2501])
def test_order_statistics_match_sort(rng, t):
    x = jnp.asarray(rng.standard_normal((3, 2, t)), jnp.float32)
    ranks = [0, 1, t // 3, t - 2, t - 1]
    got = np.asarray(order_statistics(x, ranks))
    ref = np.sort(np.asarray(x), axis=-1)[..., ranks]
    np.testing.assert_array_equal(got, ref)


def test_order_statistics_negative_heavy(rng):
    # the float-bits encoding must order negatives correctly
    x = jnp.asarray(-np.abs(rng.standard_normal((2, 1, 257))) * 100,
                    jnp.float32)
    got = np.asarray(order_statistics(x, [0, 128, 256]))
    ref = np.sort(np.asarray(x), axis=-1)[..., [0, 128, 256]]
    np.testing.assert_array_equal(got, ref)


def test_order_statistics_duplicates_and_extremes():
    x = jnp.asarray([[0.0, -0.0, 1.0, 1.0, -1.0, np.inf, -np.inf, 5.0]],
                    jnp.float32)
    got = np.asarray(order_statistics(x, list(range(8))))
    ref = np.sort(np.asarray(x), axis=-1)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("qs", [(5.0, 95.0), (50.0,), (0.0, 100.0)])
def test_exact_quantiles_match_percentile(rng, qs):
    x = jnp.asarray(rng.standard_normal((4, 1, 2500)), jnp.float32)
    got = exact_quantiles(x, qs)
    ref = jnp.percentile(x, jnp.array(list(qs)), axis=-1, keepdims=True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-6, rtol=2e-6)


def test_exact_quantiles_median_even_length(rng):
    # even length: median interpolates the two middle order statistics
    x = jnp.asarray(rng.standard_normal((2, 1, 100)), jnp.float32)
    got, = exact_quantiles(x, (50.0,))
    ref = jnp.median(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)
