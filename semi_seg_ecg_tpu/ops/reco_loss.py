"""Regional Contrastive (ReCo) loss — static-shape XLA formulation.

Semantics follow the reference ``compute_reco_loss`` /
``negative_index_sampler`` (src/algorithms/reco.py:30-154, itself after
lorenmt/reco): teacher-confident pixels above ``easy_threshold`` form
per-class regions; per valid class, hard anchors (student prob below
``hard_threshold``) are sampled with replacement; negatives are drawn
per-anchor from *other* valid classes with probability
``softmax(cos(proto_i, proto_j)/temp)``, then a uniform pixel within the
chosen class; InfoNCE over cosine similarities at ``temp`` against the
class prototype as the positive. Gradients flow through anchors only
(the reference builds positives/negatives under ``torch.no_grad()``,
reco.py:106-143).

The reference's data-dependent Python loop (ragged per-class tensors,
``len(seg_feat_hard_list[i])``-sized randint, NumPy index lists) cannot
trace under XLA. This version is shape-static and fully vectorised:

- per-class masks/prototypes via masked reductions over the flattened
  ``(B*T, D)`` pixel array (classes are a static 4-way loop);
- sampling from a masked pixel set = inverse-CDF search
  (``cumsum`` + ``searchsorted``) — O(P) memory instead of the O(S·P)
  gumbel matrix ``jax.random.choice`` would materialise;
- empty classes / <2 valid classes contribute exactly zero through
  arithmetic masking (reco.py:73-74,86-87 early-exits), with all masked
  branches kept finite so no NaN leaks through ``where``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import cross_entropy


def _masked_sample(key, mask: jnp.ndarray, num: int) -> jnp.ndarray:
    """``num`` indices ~ uniform-with-replacement over ``mask``'s True set.

    Falls back to uniform-over-everything when the mask is empty (callers
    mask the loss out in that case)."""
    p_count = jnp.sum(mask)
    p = jnp.where(
        p_count > 0,
        mask.astype(jnp.float32) / jnp.maximum(p_count, 1),
        jnp.full(mask.shape, 1.0 / mask.shape[0], jnp.float32),
    )
    cdf = jnp.cumsum(p)
    u = jax.random.uniform(key, (num,))
    return jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0,
                    mask.shape[0] - 1)


def _cosine(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1,
            eps: float = 1e-8) -> jnp.ndarray:
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return jnp.sum(a * b, axis=axis) / (na * nb)


def compute_reco_loss(
    rng,
    latent: jnp.ndarray,        # (B, D, T) student latents (strong view)
    prob_teacher: jnp.ndarray,  # (B, C, T)
    prob_student: jnp.ndarray,  # (B, C, T)
    easy_threshold: float,
    hard_threshold: float,
    temp: float,
    num_queries: int,
    num_negatives: int,
) -> jnp.ndarray:
    b, d, t = latent.shape
    c = prob_teacher.shape[1]
    p = b * t

    lat = latent.astype(jnp.float32).transpose(0, 2, 1).reshape(p, d)
    prob_t = prob_teacher.astype(jnp.float32).transpose(0, 2, 1).reshape(p, c)
    prob_s = prob_student.astype(jnp.float32).transpose(0, 2, 1).reshape(p, c)

    conf = jnp.max(prob_t, axis=1)
    pseudo = jnp.argmax(prob_t, axis=1)
    easy = conf >= easy_threshold

    # per-class regions (static loop over the 4 classes)
    valid_masks = []      # (C, P) bool
    hard_masks = []
    protos = []           # (C, D), masked means; zero when class empty
    for ci in range(c):
        valid = easy & (pseudo == ci)
        vf = valid.astype(jnp.float32)
        count = jnp.sum(vf)
        proto = jnp.sum(lat * vf[:, None], axis=0) / jnp.maximum(count, 1.0)
        valid_masks.append(valid)
        hard_masks.append(valid & (prob_s[:, ci] < hard_threshold))
        protos.append(proto)
    valid_masks = jnp.stack(valid_masks)            # (C, P)
    hard_masks = jnp.stack(hard_masks)
    protos = jnp.stack(protos)                      # (C, D)
    counts = jnp.sum(valid_masks, axis=1)
    class_valid = counts > 0
    valid_seg = jnp.sum(class_valid)

    # per-class pixel pools for negatives: (C, Q*Nn) indices
    n_neg_samples = num_queries * num_negatives
    keys = jax.random.split(rng, 3 * c).reshape(c, 3)
    pools = jnp.stack([
        _masked_sample(keys[ci, 0], valid_masks[ci], n_neg_samples)
        for ci in range(c)
    ])  # (C, Q*Nn)

    # prototype cosine-similarity matrix, invalid/self masked to -inf
    proto_sim = _cosine(protos[:, None, :], protos[None, :, :], axis=-1)  # (C, C)
    neg_logits = proto_sim / temp
    neg_logits = jnp.where(class_valid[None, :], neg_logits, -jnp.inf)
    neg_logits = jnp.where(jnp.eye(c, dtype=bool), -jnp.inf, neg_logits)

    total = jnp.zeros((), jnp.float32)
    for ci in range(c):
        k_anchor, k_class = keys[ci, 1], keys[ci, 2]
        anchor_idx = _masked_sample(k_anchor, hard_masks[ci], num_queries)
        anchors = lat[anchor_idx]                               # (Q, D) — grad

        samp_class = jax.random.categorical(
            k_class, neg_logits[ci], shape=(num_queries, num_negatives)
        )                                                       # (Q, Nn)
        slot = jnp.arange(n_neg_samples).reshape(num_queries, num_negatives)
        neg_idx = pools[samp_class, slot]                       # (Q, Nn)
        neg_feat = lat[neg_idx]                                 # (Q, Nn, D)

        pos_feat = jnp.broadcast_to(
            protos[ci][None, None, :], (num_queries, 1, d)
        )
        all_feat = jax.lax.stop_gradient(
            jnp.concatenate([pos_feat, neg_feat], axis=1)
        )                                                       # (Q, 1+Nn, D)
        logits = _cosine(anchors[:, None, :], all_feat, axis=2) / temp
        ce = cross_entropy(
            logits[:, :, None],                       # (Q, 1+Nn, 1) as (B,C,*)
            jnp.zeros((num_queries, 1), jnp.int32),
        )
        active = class_valid[ci] & (jnp.sum(hard_masks[ci]) > 0)
        total = total + jnp.where(active, ce, 0.0)

    loss = total / jnp.maximum(valid_seg, 1).astype(jnp.float32)
    return jnp.where(valid_seg > 1, loss, 0.0)
