"""Ring attention: sequence-parallel exact attention over the ``seq`` mesh axis.

The reference has no sequence parallelism at all (its only distribution is
DDP, src/main_train.py:64-101); under ``parallel.seq_parallel`` our mesh
shards the *time/token* axis, which GSPMD handles for convolutions (halo
exchange) and MLPs (elementwise over tokens) — but plain softmax attention
is all-to-all over tokens, so GSPMD's only move is to all-gather the full
(B, H, N, D) K/V *and* materialise (B, H, N, N) score blocks on every
device, erasing the memory saving that motivated sharding the sequence.

Ring attention keeps the token axis sharded end to end: each device holds
one Q/K/V chunk of N/s tokens; K/V chunks rotate around the ``seq`` ring
via ``lax.ppermute`` (ICI neighbour traffic, overlappable with the block
matmuls) while each device folds every visiting chunk into a running
flash-style online softmax (running max ``m``, denominator ``l``,
unnormalised accumulator ``o``). After ``s`` hops every Q block has
attended to every K/V block exactly once, with per-device live score
memory O((N/s)^2) instead of O(N^2) and K/V resident O(N/s) per hop.

Results are *exact* (not approximate): the online softmax is the same
reassociation flash attention uses, so values match the dense path to
numerical-reordering tolerance. The backward is an equation-based flash
VJP (``_make_local_ring``), not autodiff through the online softmax —
autodiff of the fold's scan saves an O(nb * nq * d) carry stack per hop
that no rematerialisation can remove (measured: the difference between
20.6 and 3.8 GB/device at T=2^21). The custom VJP saves only
(q, k, v, out, logsumexp), recomputes normalized probability slabs on
the same rotation schedule, and accumulates dK/dV in buffers that ride
the ring alongside their chunks.

The token count need not divide the ring: inputs are zero-padded to the
next multiple of ``s`` and the pad keys are masked out of the softmax by
their static global position (the ViT's ``N patches + 1 cls`` token axis
is indivisible by construction). Pad Q rows compute garbage that is
sliced off at the end.

For Holter-scale chunks the (N/s, N/s) score block of a single hop is
itself too large to materialise (T=2^21, s=8: 16k x 16k fp32 per
batch-head = the 100 GB/device the round-4 crossover measured), so when
``nq * nk`` exceeds ``_SCORE_CAP`` each visiting chunk is folded in key
sub-blocks of ``blk`` columns — the same online softmax, one more level
of reassociation, live score memory O(nq * blk) — with the whole fold
under one ``jax.checkpoint`` so the backward recomputes sub-blocks
instead of saving them. Flagship-sized chunks take the single-block
path unchanged.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_BIG_NEG = -1e30  # "masked" score: finite so (sc - m) never hits inf - inf

# Largest (nq * nk) score block one hop may materialise per batch-head
# before the fold switches to key sub-blocks (fp32: 4 Mi elems = 16 MiB
# per batch-head slice). Env-overridable for hardware tuning and for
# driving the sub-blocked path at test-sized shapes.
_SCORE_CAP = int(os.environ.get("ECG_RING_SCORE_CAP", 1 << 22))
_MIN_BLK = 128  # lane-width multiple; also the floor for tiny nq


def _block_update(q, k_blk, v_blk, kmask, o, m, l, *, scale, mm_dtype):
    """Fold one visiting K/V chunk into the online-softmax state.

    q: (B, H, nq, D); k_blk/v_blk: (B, H, nk, D); kmask: (nk,) bool for
    the chunk currently held (False = zero-pad key). o/m/l are the fp32
    running accumulator / max / denominator, shapes (B, H, nq, D) /
    (B, H, nq) / (B, H, nq).
    """
    sc = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(mm_dtype), k_blk.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    sc = jnp.where(kmask[None, None, None, :], sc, _BIG_NEG)
    m_new = jnp.maximum(m, sc.max(axis=-1))
    # pad keys contribute exactly 0 (the where, not just a tiny exp)
    p = jnp.exp(sc - m_new[..., None]) * kmask[None, None, None, :]
    corr = jnp.exp(m - m_new)
    l_new = l * corr + p.sum(axis=-1)
    o_new = o * corr[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(mm_dtype), v_blk.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    return o_new, m_new, l_new


def _fold_chunk(q, k_blk, v_blk, kmask, o, m, l, *, scale, mm_dtype, blk):
    """Fold one visiting K/V chunk, sub-blocking the key axis when the
    full (nq, nk) score block would be too large to materialise.

    ``blk >= nk`` takes the single-block path (bit-identical HLO to the
    pre-sub-blocking implementation); otherwise the chunk is folded in
    ``nk // blk`` column slabs through the same online softmax — one more
    level of the reassociation flash attention already performs, so the
    result is still exact. ``ring_attention`` pads the token axis so
    ``blk`` always divides ``nk``.
    """
    b, h, nk, d = k_blk.shape
    if blk >= nk:
        return _block_update(q, k_blk, v_blk, kmask, o, m, l,
                             scale=scale, mm_dtype=mm_dtype)
    nb = nk // blk
    k_r = jnp.moveaxis(k_blk.reshape(b, h, nb, blk, d), 2, 0)
    v_r = jnp.moveaxis(v_blk.reshape(b, h, nb, blk, d), 2, 0)
    m_r = kmask.reshape(nb, blk)

    def step(carry, xs):
        o, m, l = carry
        k_sb, v_sb, msk = xs
        return _block_update(q, k_sb, v_sb, msk, o, m, l,
                             scale=scale, mm_dtype=mm_dtype), None

    # the body must be checkpointed as well: differentiating the scan
    # saves each iteration's residuals, and without remat that is the
    # (nq, blk) score/probability blocks stacked nb-high — the exact
    # O((N/s)^2)-scale memory this fold exists to avoid (measured:
    # 6 GB x many at T=2^21). With it, the reverse sweep recomputes one
    # sub-block's scores at a time; only the (o, m, l) carries stack.
    (o, m, l), _ = lax.scan(jax.checkpoint(step), (o, m, l),
                            (k_r, v_r, m_r))
    return o, m, l


def _hop_grads(q, dout, lse, dd, k_c, v_c, kmask, dq, *, scale, mm_dtype,
               blk):
    """Flash-backward grads for one visiting K/V chunk.

    Recomputes the normalized probabilities ``P = exp(S - lse)`` from the
    saved logsumexp and applies the standard flash-attention backward
    (``dd = rowsum(dout * out)``):

        dV_c = P^T dout,   dP = dout V_c^T,
        dS   = P * (dP - dd) * scale,
        dq  += dS K_c,     dK_c = dS^T q.

    Key-axis sub-blocked like the forward fold; nothing here is ever
    differentiated again, so the slab scan saves no residual stacks —
    live memory is one (nq, blk) slab plus the accumulators.
    Returns (dq, dk_c, dv_c); dk_c/dv_c are this device's fp32
    contribution for the chunk currently held.
    """
    b, h, nk, d = k_c.shape

    def slab(dq, k_sb, v_sb, msk):
        sc = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(mm_dtype), k_sb.astype(mm_dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(sc - lse[..., None]) * msk[None, None, None, :]
        dv_sb = jnp.einsum(
            "bhqk,bhqd->bhkd", p.astype(mm_dtype), dout.astype(mm_dtype),
            preferred_element_type=jnp.float32)
        dp = jnp.einsum(
            "bhqd,bhkd->bhqk", dout.astype(mm_dtype), v_sb.astype(mm_dtype),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dd[..., None]) * scale
        dq = dq + jnp.einsum(
            "bhqk,bhkd->bhqd", ds.astype(mm_dtype), k_sb.astype(mm_dtype),
            preferred_element_type=jnp.float32)
        dk_sb = jnp.einsum(
            "bhqk,bhqd->bhkd", ds.astype(mm_dtype), q.astype(mm_dtype),
            preferred_element_type=jnp.float32)
        return dq, dk_sb, dv_sb

    if blk >= nk:
        dq, dk_c, dv_c = slab(dq, k_c, v_c, kmask)
        return dq, dk_c, dv_c

    nb = nk // blk
    k_r = jnp.moveaxis(k_c.reshape(b, h, nb, blk, d), 2, 0)
    v_r = jnp.moveaxis(v_c.reshape(b, h, nb, blk, d), 2, 0)
    m_r = kmask.reshape(nb, blk)

    def step(dq, xs):
        k_sb, v_sb, msk = xs
        dq, dk_sb, dv_sb = slab(dq, k_sb, v_sb, msk)
        return dq, (dk_sb, dv_sb)

    dq, (dk_r, dv_r) = lax.scan(step, dq, (k_r, v_r, m_r))
    dk_c = jnp.moveaxis(dk_r, 0, 2).reshape(b, h, nk, d)
    dv_c = jnp.moveaxis(dv_r, 0, 2).reshape(b, h, nk, d)
    return dq, dk_c, dv_c


def _make_local_ring(*, scale, mm_dtype, axis_name, ring_size,
                     valid_tokens, blk):
    """Per-shard ring attention with an equation-based flash backward.

    The forward is the online-softmax K/V ring. The backward is a
    ``jax.custom_vjp``: instead of differentiating through the
    online-softmax scan (whose autodiff saves an O(nb * nq * d) carry
    stack per hop — the 20.6 GB/device that remained at T=2^21 after
    sub-blocking), it saves only (q, k, v, out, logsumexp) and
    recomputes normalized score slabs on the reverse ring, with dK/dV
    accumulators riding around the ring alongside their chunks. Exact:
    the same rotation schedule and origin masks as the forward.
    """

    def kmask(nk, origin):
        # chunk held after t hops originated on device (my_idx - t) mod
        # ring_size; pad keys are the static tail of the padded global
        # token axis, so the mask is a pure function of the chunk origin
        return (origin * nk + jnp.arange(nk)) < valid_tokens

    perm = [(i, (i + 1) % ring_size) for i in range(ring_size)]
    fold = functools.partial(_fold_chunk, scale=scale, mm_dtype=mm_dtype,
                             blk=blk)

    def forward(q, k, v):
        b, h, nk, d = k.shape
        o = jnp.zeros(q.shape[:3] + (d,), jnp.float32)
        m = jnp.full(q.shape[:3], _BIG_NEG, jnp.float32)
        l = jnp.zeros(q.shape[:3], jnp.float32)
        my_idx = lax.axis_index(axis_name)

        # hop 0 is this device's own chunk: fold it in before any
        # ppermute so the scan rotates exactly ring_size - 1 times
        o, m, l = fold(q, k, v, kmask(nk, my_idx), o, m, l)

        def step(carry, t):
            o, m, l, k_c, v_c = carry
            k_c = lax.ppermute(k_c, axis_name, perm)
            v_c = lax.ppermute(v_c, axis_name, perm)
            o, m, l = fold(q, k_c, v_c,
                           kmask(nk, (my_idx - t) % ring_size), o, m, l)
            return (o, m, l, k_c, v_c), None

        (o, m, l, _, _), _ = lax.scan(
            step, (o, m, l, k, v), jnp.arange(1, ring_size))
        out = o / l[..., None]
        # logsumexp of the masked scores: exp(S - lse) is the exactly
        # normalized probability the backward recomputes per slab
        lse = m + jnp.log(l)
        return out, lse

    @jax.custom_vjp
    def attend(q, k, v):
        return forward(q, k, v)[0]

    def fwd(q, k, v):
        out, lse = forward(q, k, v)
        return out, (q, k, v, out, lse)

    def bwd(res, dout):
        q, k, v, out, lse = res
        b, h, nk, d = k.shape
        my_idx = lax.axis_index(axis_name)
        dout = dout.astype(jnp.float32)
        dd = jnp.sum(dout * out, axis=-1)  # (B, H, nq)
        dq = jnp.zeros(q.shape, jnp.float32)
        grads = functools.partial(_hop_grads, q, dout, lse, dd,
                                  scale=scale, mm_dtype=mm_dtype, blk=blk)

        # same rotation schedule as the forward; dK/dV accumulators ride
        # the ring WITH their chunk, collecting every device's
        # contribution, then one final ppermute brings them home
        dq, dk, dv = grads(k, v, kmask(nk, my_idx), dq)

        def step(carry, t):
            dq, k_c, v_c, dk_c, dv_c = carry
            k_c = lax.ppermute(k_c, axis_name, perm)
            v_c = lax.ppermute(v_c, axis_name, perm)
            dk_c = lax.ppermute(dk_c, axis_name, perm)
            dv_c = lax.ppermute(dv_c, axis_name, perm)
            dq, dk_h, dv_h = grads(k_c, v_c,
                                   kmask(nk, (my_idx - t) % ring_size), dq)
            return (dq, k_c, v_c, dk_c + dk_h, dv_c + dv_h), None

        (dq, _, _, dk, dv), _ = lax.scan(
            step, (dq, k, v, dk, dv), jnp.arange(1, ring_size))
        # after ring_size - 1 hops the chunk (and its accumulator) of
        # origin (my_idx + 1) sits here; one more rotation sends every
        # accumulator to its home device
        if ring_size > 1:
            dk = lax.ppermute(dk, axis_name, perm)
            dv = lax.ppermute(dv, axis_name, perm)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))

    attend.defvjp(fwd, bwd)
    return attend


def _local_ring(q, k, v, *, scale, mm_dtype, axis_name, ring_size,
                valid_tokens, blk):
    """Per-shard body under shard_map: q/k/v are this device's local
    (B, H, N/s, D) chunks of the padded token axis."""
    return _make_local_ring(
        scale=scale, mm_dtype=mm_dtype, axis_name=axis_name,
        ring_size=ring_size, valid_tokens=valid_tokens, blk=blk,
    )(q, k, v)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    *,
    mm_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Sequence-parallel exact attention over the current mesh's ``seq`` axis.

    ``q, k, v``: (B, H, N, D). Returns fp32 (B, H, N, D) — softmax(QK^T *
    scale) V with the token axis kept sharded over ``seq`` throughout
    (K/V ring via ppermute). Batch shards over ``data`` and heads over
    ``model`` when they divide. Falls back to dense XLA attention when
    there is no live mesh or its ``seq`` axis is 1.
    """
    from ..parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, SEQ_AXIS, get_current_mesh,
        seq_parallel_size,
    )

    if mm_dtype is None:
        mm_dtype = q.dtype
    b, h, n, d = q.shape
    mesh = get_current_mesh()
    s = 1 if mesh is None else seq_parallel_size(mesh)
    if s == 1:
        from .attention import dense_attention

        return dense_attention(q, k, v, scale, mm_dtype=mm_dtype)

    # key sub-block width: single-block (blk >= nk) until one hop's
    # (nq, nk) score block exceeds _SCORE_CAP per batch-head. Past the
    # cap, blk balances the two O(large) buffers the sub-blocked fold
    # carries — the live score block (nq*blk) and the inner scan's
    # per-iteration (o) carry stack ((nk/blk)*nq*d from differentiating
    # the online softmax) — equal at blk = sqrt(d*nk), making per-device
    # attention temp O(nq^1.5) instead of O(nq^2). Padding must then
    # make s*blk divide the token axis so every chunk splits evenly
    # (more masked pad keys — the origin-index mask handles any amount).
    nq0 = -(-n // s)
    if nq0 * nq0 > _SCORE_CAP:
        blk = int((d * nq0) ** 0.5) // _MIN_BLK * _MIN_BLK
        blk = max(_MIN_BLK, min(blk, nq0))
        unit = s * blk
    else:
        blk = nq0 + _MIN_BLK  # sentinel: always >= nk -> single block
        unit = s
    pad = (-n) % unit
    if pad:
        zeros = jnp.zeros(q.shape[:2] + (pad, d), q.dtype)
        q = jnp.concatenate([q, zeros], axis=2)
        k = jnp.concatenate([k, zeros.astype(k.dtype)], axis=2)
        v = jnp.concatenate([v, zeros.astype(v.dtype)], axis=2)

    b_ax = DATA_AXIS if b % mesh.shape[DATA_AXIS] == 0 else None
    h_ax = MODEL_AXIS if h % mesh.shape[MODEL_AXIS] == 0 else None
    spec = jax.sharding.PartitionSpec(b_ax, h_ax, SEQ_AXIS, None)

    local = functools.partial(
        _local_ring, scale=scale, mm_dtype=mm_dtype, axis_name=SEQ_AXIS,
        ring_size=s, valid_tokens=n, blk=blk)
    out = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
    return out[:, :, :n, :] if pad else out
