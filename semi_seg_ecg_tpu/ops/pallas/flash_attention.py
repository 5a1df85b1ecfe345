"""Blockwise (flash) attention as Pallas TPU kernels, forward and backward.

The shipped ECG configs run ~101 patches, where XLA's fused attention is
already optimal (vision_transformer.py softmax attention is O(n²) but tiny —
SURVEY §5 long-context row). These kernels serve the *long-sequence* regime
the ViT supports (small ``patch_size`` / long ``seq_len``): neither pass
materialises the (N, N) score matrix.

Measured on TPU v5e (n=2048, b=8, h=12, d=64, bf16, value-fetch-barrier
slope timing, 512x512 blocks): forward 2.09 ms vs XLA fused attention
6.95 ms (3.3x); fwd+bwd 6.23 ms vs 22.5 ms (3.6x).

Design: one grid program per (batch·head); Q/K/V for that head stay
resident in VMEM and the kernel streams q-blocks (forward) or recomputes
score blocks (backward) with fp32 accumulators. The forward additionally
emits the row logsumexp so the backward never re-does the softmax
reduction. A VMEM budget guard rejects shapes that would not fit
(callers use :func:`fits_vmem`; the ViT's ``auto`` mode falls back to XLA).

Shapes: ``q, k, v`` are ``(B, H, N, D)``; output matches ``q``. ``N`` and
``D`` are padded internally to TPU tile multiples; padded KV columns are
masked to -inf before the softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Block size is the dominant performance lever: the same kernel at
# (128, 128) ran 9.65 ms for the n=2048 benchmark shape vs 2.09 ms at
# (512, 512) — 16x16=256 inner iterations of 128x128 matmuls leave the
# MXU starved and pay the fori_loop bookkeeping 16x more often. Blocks
# default to None = pick_blocks(): the largest square block that fits
# the VMEM working-set estimate.
DEFAULT_BLOCK_Q = None
DEFAULT_BLOCK_K = None

# one (batch, head)'s working set must stay resident in VMEM (~16 MB on
# v5e). Calibrated against hardware: the flagship benchmark shape
# (n=2048, d=64, 512x512 blocks) estimates 12.1 MB and runs clean;
# leave the rest as Mosaic headroom (an overflow wedges the remote
# tunnel for ~1 h, NOTES.md).
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _workset_bytes(n_pad: int, d_pad: int, block_q: int,
                   block_k: int) -> int:
    """Backward-pass high-water VMEM estimate (the forward's is strictly
    smaller): bf16 q/k/v/do resident + fp32 dq/dk/dv outputs + lse/delta
    columns + per-block temporaries (s/p/dp/ds tiles, the col iota, and
    the fp32 q/do slices)."""
    resident = (4 * n_pad * d_pad * 2      # q, k, v, do (bf16)
                + 3 * n_pad * d_pad * 4    # dq, dk, dv (fp32)
                + 2 * n_pad * 4)           # lse, delta
    temps = (6 * block_q * block_k * 4     # s/p/dp/ds + col mask tiles
             + 2 * block_q * d_pad * 4)    # fp32 q, do block slices
    return resident + temps


def pick_blocks(n: int, d: int):
    """Largest square block (512 -> 256 -> 128) whose working set fits
    VMEM, never padding ``n`` past a single block. Returns
    ``(block_q, block_k)`` or None if even 128x128 does not fit."""
    d_pad = _round_up(d, 128)
    for b in (512, 256, 128):
        if b > _round_up(n, 128):
            continue
        n_pad = _round_up(n, b)
        if _workset_bytes(n_pad, d_pad, b, b) <= _VMEM_BUDGET_BYTES:
            return b, b
    return None


def _resolve_blocks(n: int, d: int, block_q, block_k):
    if block_q is not None and block_k is not None:
        return block_q, block_k
    picked = pick_blocks(n, d)
    if picked is None:
        raise ValueError(
            f"flash_attention: no block size fits VMEM for n={n}, d={d}; "
            "use the XLA attention path")
    return (picked[0] if block_q is None else block_q,
            picked[1] if block_k is None else block_k)


def fits_vmem(n: int, d: int, block_q: int = None,
              block_k: int = None) -> bool:
    if block_q is None or block_k is None:
        return pick_blocks(n, d) is not None
    n_pad = _round_up(n, max(block_q, block_k))
    d_pad = _round_up(d, 128)
    return _workset_bytes(n_pad, d_pad, block_q, block_k) \
        <= _VMEM_BUDGET_BYTES


def _check_vmem(n_pad, d_pad, block_q, block_k, interpret):
    if not interpret and (_workset_bytes(n_pad, d_pad, block_q, block_k)
                          > _VMEM_BUDGET_BYTES):
        raise ValueError(
            f"flash_attention working set (n_pad={n_pad}, d_pad={d_pad}, "
            f"blocks={block_q}x{block_k}) exceeds the VMEM budget; use "
            "the XLA attention path"
        )


def _pad4(x, n_pad, d_pad):
    b, h, n, d = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                n_valid: int, block_q: int, block_k: int):
    # q/k/v/o refs: (1, N_pad, D); lse_ref: (1, N_pad, 1) — one (batch, head)
    # per grid program, K/V loaded once and reused across q blocks
    _, n_pad, d = q_ref.shape
    num_qb = n_pad // block_q
    num_kb = n_pad // block_k

    def q_block(qb, _):
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        q = q * scale

        def body(kb, carry):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(
                jnp.float32)
            v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(
                jnp.float32)
            s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), dimension=1
            )
            s = jnp.where(col < n_valid, s, -jnp.inf)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p, v_blk, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)
        m_fin, l_fin, acc_fin = jax.lax.fori_loop(0, num_kb, body,
                                                  (m0, l0, acc0))
        sl = pl.ds(qb * block_q, block_q)
        o_ref[0, sl, :] = (
            acc_fin / jnp.maximum(l_fin, 1e-30)
        ).astype(o_ref.dtype)
        lse_ref[0, sl, :] = m_fin + jnp.log(jnp.maximum(l_fin, 1e-30))
        return 0

    jax.lax.fori_loop(0, num_qb, q_block, 0)


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    b, h, n, d = q.shape
    block_q, block_k = _resolve_blocks(n, d, block_q, block_k)
    n_pad = _round_up(n, max(block_q, block_k))
    d_pad = _round_up(d, 128)
    _check_vmem(n_pad, d_pad, block_q, block_k, interpret)

    qp = _pad4(q, n_pad, d_pad).reshape(b * h, n_pad, d_pad)
    kp = _pad4(k, n_pad, d_pad).reshape(b * h, n_pad, d_pad)
    vp = _pad4(v, n_pad, d_pad).reshape(b * h, n_pad, d_pad)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, n_valid=n, block_q=block_q,
        block_k=block_k,
    )
    spec = pl.BlockSpec((1, n_pad, d_pad), lambda bh: (bh, 0, 0))
    lse_spec = pl.BlockSpec((1, n_pad, 1), lambda bh: (bh, 0, 0))
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
    lse = lse.reshape(b, h, n_pad)[:, :, :n]
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, n_valid: int,
                block_q: int, block_k: int):
    """Per (batch, head): recompute p blockwise from the saved logsumexp and
    accumulate dq / dk / dv with fp32 VMEM accumulators.

    standard flash backward:
      p  = exp(s - lse)          (rowwise, no second max pass needed)
      dv = pᵀ · do
      dp = do · vᵀ
      ds = p ⊙ (dp - Δ),  Δ = rowsum(do ⊙ o)
      dq = ds · k · scale,  dk = dsᵀ · q · scale
    """
    _, n_pad, d = q_ref.shape
    num_qb = n_pad // block_q
    num_kb = n_pad // block_k

    # zero the K/V-side accumulators once
    dk_ref[0] = jnp.zeros((n_pad, d), dk_ref.dtype)
    dv_ref[0] = jnp.zeros((n_pad, d), dv_ref.dtype)

    def q_block(qb, _):
        qsl = pl.ds(qb * block_q, block_q)
        q = q_ref[0, qsl, :].astype(jnp.float32) * scale
        do = do_ref[0, qsl, :].astype(jnp.float32)
        lse = lse_ref[0, qsl, :]                       # (BQ, 1)
        delta = delta_ref[0, qsl, :]                   # (BQ, 1)
        row = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), dimension=0
        )
        row_valid = row < n_valid

        def body(kb, dq_acc):
            ksl = pl.ds(kb * block_k, block_k)
            k_blk = k_ref[0, ksl, :].astype(jnp.float32)
            v_blk = v_ref[0, ksl, :].astype(jnp.float32)
            s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), dimension=1
            )
            p = jnp.where(
                (col < n_valid) & row_valid, jnp.exp(s - lse), 0.0
            )
            dv_ref[0, ksl, :] += jnp.dot(
                p.T, do, preferred_element_type=jnp.float32
            ).astype(dv_ref.dtype)
            dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            dk_ref[0, ksl, :] += (scale * jnp.dot(
                ds.T, q / scale, preferred_element_type=jnp.float32
            )).astype(dk_ref.dtype)
            return dq_acc + jnp.dot(
                ds, k_blk, preferred_element_type=jnp.float32
            )

        dq = jax.lax.fori_loop(
            0, num_kb, body, jnp.zeros((block_q, d), jnp.float32)
        )
        dq_ref[0, qsl, :] = (dq * scale).astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_qb, q_block, 0)


def _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k,
                    interpret):
    b, h, n, d = q.shape
    block_q, block_k = _resolve_blocks(n, d, block_q, block_k)
    n_pad = _round_up(n, max(block_q, block_k))
    d_pad = _round_up(d, 128)
    _check_vmem(n_pad, d_pad, block_q, block_k, interpret)

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )  # (B, H, N, 1)
    flat = lambda x: _pad4(x, n_pad, d_pad).reshape(b * h, n_pad, d_pad)
    qp, kp, vp, dop = flat(q), flat(k), flat(v), flat(g)
    lsep = jnp.pad(lse[..., None], ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
                   ).reshape(b * h, n_pad, 1)
    deltap = jnp.pad(delta, ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
                     ).reshape(b * h, n_pad, 1)

    kernel = functools.partial(
        _bwd_kernel, scale=scale, n_valid=n, block_q=block_q,
        block_k=block_k,
    )
    spec = pl.BlockSpec((1, n_pad, d_pad), lambda bh: (bh, 0, 0))
    vec_spec = pl.BlockSpec((1, n_pad, 1), lambda bh: (bh, 0, 0))
    f32 = jnp.float32
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec, vec_spec, vec_spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), f32),
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), f32),
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), f32),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    unflat = lambda x: x.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
    return (unflat(dq).astype(q.dtype), unflat(dk).astype(k.dtype),
            unflat(dv).astype(v.dtype))


def _reference_attention(q, k, v, scale):
    from ..attention import dense_attention

    return dense_attention(q, k, v, scale,
                           mm_dtype=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale: float, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K, interpret: bool = False):
    """softmax(q kᵀ · scale) v without materialising the score matrix."""
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out


def _fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _bwd(scale, block_q, block_k, interpret, residuals, g):
    q, k, v, out, lse = residuals
    return _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k,
                           interpret)


flash_attention.defvjp(_fwd, _bwd)


def sharded_flash_attention(q, k, v, scale: float,
                            block_q: int = DEFAULT_BLOCK_Q,
                            block_k: int = DEFAULT_BLOCK_K,
                            interpret: bool = False):
    """Mesh-aware flash attention: shard the kernel over the training mesh.

    ``pallas_call`` has no GSPMD partitioning rule, so inside a jitted
    step over a multi-device mesh the bare kernel would be computed fully
    replicated (XLA all-gathers q/k/v around it). The kernel is
    embarrassingly parallel over (batch, head), so we wrap it in
    ``shard_map`` with batch on the ``data`` axis and heads on the
    ``model`` axis — each shard runs the kernel on its local
    (batch, head) slice with zero collectives, which is exactly the
    Megatron-style head-parallel layout the TP rules already give the QKV
    projection (parallel/sharding_rules.py). Falls back to the bare kernel
    when no training mesh exists or shapes don't divide the mesh.
    """
    from ...parallel.mesh import DATA_AXIS, MODEL_AXIS, get_current_mesh

    mesh = get_current_mesh()
    b, h, _, _ = q.shape
    if mesh is None or mesh.size == 1:
        return flash_attention(q, k, v, scale, block_q, block_k, interpret)
    dp, tp = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
    if b % dp != 0 or h % tp != 0:
        return flash_attention(q, k, v, scale, block_q, block_k, interpret)

    from jax.sharding import PartitionSpec as P

    spec = P(DATA_AXIS, MODEL_AXIS, None, None)

    def inner(qs, ks, vs):  # custom_vjp: positional args only
        return flash_attention(qs, ks, vs, scale, block_q, block_k, interpret)

    return jax.shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
