"""ReCo contrastive loss: semantics, edge cases, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.ops.reco_loss import _masked_sample, compute_reco_loss


def _inputs(rng, b=2, d=16, t=64, c=4, peaked=True):
    latent = jnp.asarray(rng.standard_normal((b, d, t)), jnp.float32)
    logits_t = rng.standard_normal((b, c, t)).astype(np.float32)
    if peaked:
        # make teacher confident: one dominant class per position
        winners = rng.integers(0, c, (b, t))
        for bi in range(b):
            logits_t[bi, winners[bi], np.arange(t)] += 10.0
    prob_t = jax.nn.softmax(jnp.asarray(logits_t), axis=1)
    prob_s = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32), axis=1)
    return latent, prob_t, prob_s


def test_masked_sample_respects_mask(rng):
    mask = jnp.asarray(np.arange(100) % 7 == 0)
    idx = np.asarray(_masked_sample(jax.random.key(0), mask, 256))
    assert (idx % 7 == 0).all()


def test_masked_sample_empty_mask_stays_valid(rng):
    mask = jnp.zeros((50,), bool)
    idx = np.asarray(_masked_sample(jax.random.key(1), mask, 16))
    assert ((idx >= 0) & (idx < 50)).all()


def test_reco_loss_finite_and_positive(rng):
    latent, prob_t, prob_s = _inputs(rng)
    loss = compute_reco_loss(
        jax.random.key(0), latent, prob_t, prob_s,
        easy_threshold=0.5, hard_threshold=0.9, temp=0.25,
        num_queries=16, num_negatives=32,
    )
    assert np.isfinite(float(loss))
    assert float(loss) > 0.0


def test_reco_loss_zero_when_single_class(rng):
    # all teacher mass on one class → valid_seg == 1 → loss 0 (reco.py:86-87)
    latent = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    prob_t = jnp.zeros((1, 4, 32)).at[:, 2, :].set(1.0)
    prob_s = jnp.full((1, 4, 32), 0.25)
    loss = compute_reco_loss(
        jax.random.key(0), latent, prob_t, prob_s,
        easy_threshold=0.5, hard_threshold=0.9, temp=0.25,
        num_queries=8, num_negatives=8,
    )
    assert float(loss) == 0.0


def test_reco_loss_zero_when_nothing_confident(rng):
    latent, prob_t, prob_s = _inputs(rng, peaked=False)
    loss = compute_reco_loss(
        jax.random.key(0), latent, prob_t, prob_s,
        easy_threshold=0.999, hard_threshold=0.9, temp=0.25,
        num_queries=8, num_negatives=8,
    )
    assert float(loss) == 0.0


def test_reco_loss_grad_flows_and_is_finite(rng):
    latent, prob_t, prob_s = _inputs(rng)

    def f(lat):
        return compute_reco_loss(
            jax.random.key(0), lat, prob_t, prob_s,
            easy_threshold=0.5, hard_threshold=0.95, temp=0.25,
            num_queries=8, num_negatives=16,
        )

    g = jax.grad(f)(latent)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0  # anchors carry gradient


def test_reco_loss_grad_finite_in_masked_regimes(rng):
    # even when the loss is masked to zero, grads must not be NaN
    latent = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    prob_t = jnp.zeros((1, 4, 32)).at[:, 0, :].set(1.0)
    prob_s = jnp.full((1, 4, 32), 0.25)

    def f(lat):
        return compute_reco_loss(
            jax.random.key(0), lat, prob_t, prob_s,
            easy_threshold=0.5, hard_threshold=0.9, temp=0.25,
            num_queries=8, num_negatives=8,
        )

    g = np.asarray(jax.grad(f)(latent))
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g, 0.0)


def test_reco_loss_jittable(rng):
    latent, prob_t, prob_s = _inputs(rng)
    f = jax.jit(lambda k, l: compute_reco_loss(
        k, l, prob_t, prob_s, 0.5, 0.9, 0.25, 8, 16))
    v1 = float(f(jax.random.key(0), latent))
    v2 = float(f(jax.random.key(0), latent))
    assert v1 == v2
    assert np.isfinite(v1)


def test_reco_loss_low_hard_threshold_increases_anchor_pool(rng):
    # hard_threshold=1.0 → every valid pixel is an anchor; loss defined
    latent, prob_t, prob_s = _inputs(rng)
    loss = compute_reco_loss(
        jax.random.key(0), latent, prob_t, prob_s,
        easy_threshold=0.5, hard_threshold=1.0, temp=0.25,
        num_queries=16, num_negatives=16,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
